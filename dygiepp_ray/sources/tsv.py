"""Gold/prediction TSV readers (SURVEY.md §2.1 S6; FIXTURES.md §4).

Table shapes consumed by the reference's evaluation scripts:
- relations gold: (id, text, arg0, arg1, rel, y) — only y == 'accept' rows
  are used (eval_metric.py:79-81)
- predictions:    (id, text, arg0, arg1, rel, conf) (eval_metric.py:84)
- events gold:    (id, text, arg0, trigger, arg1) (eval_events.py:52-53)
- coref table:    (id, arg0..argN) cluster-mate columns padded with '=='
  (eval_utils.py:186-209)

All readers return `ray.data.Dataset`s built via `ray.data.read_csv` with an
explicit tab parser, plus vectorized cleanup in `map_batches`.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from pyarrow import csv as pacsv

import ray.data

RELATIONS_GOLD_COLUMNS = ["id", "text", "arg0", "arg1", "rel", "y"]
PREDICTIONS_COLUMNS = ["id", "text", "arg0", "arg1", "rel", "conf"]
EVENTS_GOLD_COLUMNS = ["id", "text", "arg0", "trigger", "arg1"]


def _tsv_options(column_names: list[str] | None):
    read_opts = pacsv.ReadOptions(column_names=column_names)
    parse_opts = pacsv.ParseOptions(delimiter="\t")
    return dict(read_options=read_opts, parse_options=parse_opts)


def read_relations_gold(path: str, has_header: bool = False) -> "ray.data.Dataset":
    """Gold relation rows, filtered to y == 'accept'."""
    names = None if has_header else RELATIONS_GOLD_COLUMNS
    ds = ray.data.read_csv(path, **_tsv_options(names))

    def keep_accept(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["y"], "accept")).drop_columns(["y"])

    return ds.map_batches(keep_accept, batch_format="pyarrow")


def read_predictions(path: str, has_header: bool = False) -> "ray.data.Dataset":
    names = None if has_header else PREDICTIONS_COLUMNS
    ds = ray.data.read_csv(path, **_tsv_options(names))

    def cast_conf(t: pa.Table) -> pa.Table:
        i = t.column_names.index("conf")
        return t.set_column(i, "conf", pc.cast(t["conf"], pa.float64()))

    return ds.map_batches(cast_conf, batch_format="pyarrow")


def read_events_gold(path: str, has_header: bool = False) -> "ray.data.Dataset":
    names = None if has_header else EVENTS_GOLD_COLUMNS
    return ray.data.read_csv(path, **_tsv_options(names))


def read_coref_table(path: str, max_mates: int = 9) -> "ray.data.Dataset":
    """Coref cluster-mate rows: (id, mates: list<string>) with '==' padding
    stripped (eval_utils.py:186-209)."""
    names = ["id"] + [f"arg{i}" for i in range(max_mates)]
    ds = ray.data.read_csv(path, **_tsv_options(names))

    def fold(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_pylist()
        mates = []
        cols = [t.column(f"arg{i}").to_pylist() for i in range(max_mates)]
        for r in range(t.num_rows):
            row = [cols[i][r] for i in range(max_mates)]
            mates.append([m for m in row if m not in (None, "", "==")])
        return pa.table(
            {"id": pa.array(ids, pa.string()),
             "mates": pa.array(mates, pa.list_(pa.string()))}
        )

    return ds.map_batches(fold, batch_format="pyarrow")


def write_kb_tsv(triples: "ray.data.Dataset", out_dir: str,
                 include_header: bool = False) -> str:
    """S5 — literal TSV KB sink (dygie_pred_to_tsv.py:23-34,
    make_kb.py:175-197 column order): one TSV shard per block, so a failed
    run can re-emit per shard. The Parquet sink (`pipelines/kg.py:build_kg`)
    stays the scale path; this writer exists for byte-compatibility with the
    reference's downstream TSV consumers."""
    cols = ["doc_id", "sentence", "subj", "obj", "pred", "conf"]

    def _opts():
        # WriteOptions isn't picklable — build it inside the write task
        import pyarrow.csv as pacsv

        return {"write_options": pacsv.WriteOptions(
            include_header=include_header, delimiter="\t",
            quoting_style="none")}

    triples.select_columns(cols).write_csv(out_dir, arrow_csv_args_fn=_opts)
    return out_dir
