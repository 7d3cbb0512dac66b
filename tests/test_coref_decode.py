"""M6 antecedent scoring + greedy cluster decode."""

import pyarrow as pa

from dygiepp_ray.stages.kernel import (
    ExtractionKernel,
    coref_antecedent_decode,
    decode_antecedents,
)


def test_decode_antecedents_greedy_chains():
    # 0←null, 1←0, 2←1, 3←null, 4←3 → clusters {0,1,2}, {3,4}
    assert decode_antecedents([-1, 0, 1, -1, 3]) == [[0, 1, 2], [3, 4]]


def test_decode_antecedents_join_existing():
    # two mentions pointing at the same antecedent join ONE cluster
    assert decode_antecedents([-1, 0, 0]) == [[0, 1, 2]]
    assert decode_antecedents([-1, -1, -1]) == []


def test_antecedent_decode_matches_canonical_pairs():
    mentions = [
        (0, 1, "hash join"),
        (4, 4, "latency"),
        (8, 9, "hash join"),
        (12, 12, "latency"),
        (15, 16, "hash join"),
    ]
    clusters = coref_antecedent_decode(mentions, doc_tokens=100)
    assert clusters == [[0, 2, 4], [1, 3]]


def test_antecedent_pruning_caps_mentions():
    # doc_tokens=10, spans_per_word=0.3 → k = 3: only first 3 mentions scored
    mentions = [(i, i, "x") for i in range(6)]
    clusters = coref_antecedent_decode(mentions, doc_tokens=10)
    flat = {i for c in clusters for i in c}
    assert flat == {0, 1, 2}


def test_kernel_antecedent_mode():
    kernel = ExtractionKernel(coref_mode="antecedent")
    batch = pa.table(
        {
            "doc_key": pa.array(["d"]),
            "sentences": pa.array(
                [[["hash", "join", "wins", "."], ["hash", "join", "again", "."]]],
                pa.list_(pa.list_(pa.string())),
            ),
        }
    )
    out = kernel(batch)
    clusters = out.column("predicted_clusters").to_pylist()[0]
    assert clusters == [[{"start": 0, "end": 1}, {"start": 4, "end": 5}]]
