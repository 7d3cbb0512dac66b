"""Graph materialization tables vs pandas oracles."""

import pandas as pd

import ray.data

from dygiepp_ray.pipelines.kg import graph_edges, graph_nodes


def _triples():
    return pd.DataFrame({
        "subj_norm": ["a", "a", "a", "b", "c"],
        "pred": ["R", "R", "S", "R", "R"],
        "obj_norm": ["b", "b", "b", "c", "a"],
        "conf": [0.9, 0.5, 0.8, 1.0, 0.7],
    })


def test_graph_edges_weights_and_confs():
    got = graph_edges(ray.data.from_pandas(_triples())).to_pandas()
    got = got.set_index(["subj_norm", "pred", "obj_norm"])
    assert got.loc[("a", "R", "b"), "weight"] == 2
    assert got.loc[("a", "R", "b"), "conf_max"] == 0.9
    assert got.loc[("a", "R", "b"), "conf_mean"] == 0.7
    assert got.loc[("b", "R", "c"), "weight"] == 1
    assert len(got) == 4


def test_graph_nodes_counts_both_slots():
    got = graph_nodes(ray.data.from_pandas(_triples())).to_pandas()
    counts = dict(zip(got["span_norm"], got["mention_count"]))
    # a: 3 subj + 1 obj; b: 1 subj + 3 obj; c: 1 subj + 1 obj
    assert counts == {"a": 4, "b": 4, "c": 2}
