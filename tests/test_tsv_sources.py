"""S6 gold/prediction TSV readers."""

import pytest

from dygiepp_ray.sources.tsv import (
    read_coref_table,
    read_events_gold,
    read_predictions,
    read_relations_gold,
)


@pytest.fixture()
def tsv_dir(tmp_path):
    (tmp_path / "gold.tsv").write_text(
        "d1\tsome sentence\thash join\tquery\tMECHANISM\taccept\n"
        "d1\tother sentence\tsort\tscan\tMECHANISM\treject\n"
        "d2\tthird sentence\tindex\tlatency\tEFFECT\taccept\n"
    )
    (tmp_path / "pred.tsv").write_text(
        "d1\tsome sentence\thash join\tquery\tMECHANISM\t0.93\n"
        "d2\tthird sentence\tindex\tlatency\tEFFECT\t0.41\n"
    )
    (tmp_path / "events.tsv").write_text(
        "d1\tsent text\tworker\tshipped\tpayload\n"
    )
    (tmp_path / "coref.tsv").write_text(
        "d1\tthe system\tit\t==\t==\t==\t==\t==\t==\t==\n"
        "d2\tthis approach\tthat\tit\t==\t==\t==\t==\t==\t==\n"
    )
    return tmp_path


def test_relations_gold_accept_filter(tsv_dir):
    df = read_relations_gold(str(tsv_dir / "gold.tsv")).to_pandas()
    assert len(df) == 2  # reject row dropped
    assert "y" not in df.columns
    assert set(df["id"]) == {"d1", "d2"}


def test_predictions_conf_cast(tsv_dir):
    df = read_predictions(str(tsv_dir / "pred.tsv")).to_pandas()
    assert df["conf"].dtype.kind == "f"
    assert df.loc[df["id"] == "d1", "conf"].iloc[0] == pytest.approx(0.93)


def test_events_gold(tsv_dir):
    df = read_events_gold(str(tsv_dir / "events.tsv")).to_pandas()
    assert df.iloc[0]["trigger"] == "shipped"


def test_coref_table_strips_padding(tsv_dir):
    df = read_coref_table(str(tsv_dir / "coref.tsv")).to_pandas()
    mates = {r["id"]: list(r["mates"]) for _, r in df.iterrows()}
    assert mates["d1"] == ["the system", "it"]
    assert mates["d2"] == ["this approach", "that", "it"]


def test_write_kb_tsv_roundtrip(tmp_path):
    import glob

    import pyarrow as pa
    import ray.data

    from dygiepp_ray.sources.tsv import write_kb_tsv

    tri = ray.data.from_arrow(pa.table({
        "doc_id": ["d1", "d2"], "sentence": ["a b .", "c d ."],
        "subj": ["a", "c"], "obj": ["b", "d"],
        "pred": ["USED-FOR", "PART-OF"],
        "conf": pa.array([0.9, 0.8], pa.float32()),
        "subj_norm": ["a", "c"], "obj_norm": ["b", "d"],
        "content_sha256": ["x", "y"],
    }))
    out = str(tmp_path / "kb")
    write_kb_tsv(tri, out)
    lines = []
    for f in glob.glob(out + "/*"):
        with open(f) as fh:
            lines += [l.rstrip("\n") for l in fh if l.strip()]
    assert sorted(lines) == [
        "d1\ta b .\ta\tb\tUSED-FOR\t0.9",
        "d2\tc d .\tc\td\tPART-OF\t0.8",
    ]
