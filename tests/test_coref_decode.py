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


def test_bucket_distance_allennlp_twin():
    from dygiepp_ray.stages.kernel import bucket_distance

    # identity region ≤ 4, then floor(log2(d)) + 3, clamped at 9
    assert [bucket_distance(d) for d in (0, 1, 2, 3, 4)] == [0, 1, 2, 3, 4]
    assert bucket_distance(5) == 5 and bucket_distance(7) == 5
    assert bucket_distance(8) == 6 and bucket_distance(15) == 6
    assert bucket_distance(16) == 7 and bucket_distance(64) == 9
    assert bucket_distance(10_000) == 9


def test_antecedent_scored_partial_match_links_when_close():
    from dygiepp_ray.stages.kernel import antecedent_pair_score, coref_antecedent_decode

    # partial canonical overlap (jaccard ≥ 0.5) links only at close range:
    # sim (1.0·j) - 0.1·bucket crosses the null score (0) with distance
    assert antecedent_pair_score("hash join", "hash join index", 1) > 0
    assert antecedent_pair_score("hash join", "hash join index", 10_000) < 0
    # below the 0.5 jaccard floor → never links
    assert antecedent_pair_score("hash join", "merge sort", 1) == float("-inf")

    mentions = [(0, 1, "hash join"), (3, 5, "hash join index"),
                (90, 92, "hash join tree")]
    clusters = coref_antecedent_decode(mentions, doc_tokens=400)
    # each links to its predecessor (pruned-list distance 1)
    assert clusters == [[0, 1, 2]]


def test_antecedent_mention_score_prefers_stronger_antecedent():
    from dygiepp_ray.stages.kernel import coref_antecedent_decode

    # two exact-match antecedents one position apart: the farther one wins
    # when its mention score outweighs the distance-bucket step
    mentions = [(0, 1, "x y"), (5, 6, "x y"), (10, 11, "x y")]
    near = coref_antecedent_decode(mentions, doc_tokens=100)
    assert near == [[0, 1, 2]]  # chain via nearest
    boosted = coref_antecedent_decode(
        mentions, doc_tokens=100, mention_scores=[0.5, 0.0, 0.0])
    assert boosted == [[0, 1, 2]]  # same clusters, antecedent 0 preferred


def test_propagate_antecedent_labels_gated_flip():
    # M7 over antecedent scores (coref.py:142-144 update rule with a fixed
    # 0.5 gate): a strong antecedent pulls the mention's label across in two
    # iterations but not one (the gate halves the pull per round).
    from dygiepp_ray.stages.kernel import propagate_antecedent_labels

    rows = [[], [(0, 4.0)]]  # mention 1 strongly prefers antecedent 0
    assert propagate_antecedent_labels(["A", "B"], rows, iterations=1) == \
        ["A", "B"]
    assert propagate_antecedent_labels(["A", "B"], rows, iterations=2) == \
        ["A", "A"]
    # empty rows / zero iterations are identity
    assert propagate_antecedent_labels(["A", "B"], rows, iterations=0) == \
        ["A", "B"]
    assert propagate_antecedent_labels([], [], iterations=3) == []


def test_kernel_antecedent_mode_with_propagation():
    # end-to-end: antecedent mode + coref_prop relabels a clustered mention
    # through the kernel (labels come from the lexicon; identical canonical
    # forms cluster and share the propagated distribution)
    kernel = ExtractionKernel(coref_mode="antecedent", coref_prop=2)
    batch = _ant_doc_batch()
    out = kernel(batch)
    assert out.column("_failed_prediction").to_pylist() == [False]
    clusters = out.column("predicted_clusters").to_pylist()[0]
    assert len(clusters) >= 1


def _ant_doc_batch():
    import pyarrow as pa

    sents = [["the", "hash", "join", "runs", "."],
             ["hash", "join", "wins", "again", "."]]
    return pa.table({
        "doc_key": pa.array(["d0"]),
        "sentences": pa.array([sents], pa.list_(pa.list_(pa.string()))),
    })
