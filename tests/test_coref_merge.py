"""Cluster-merge golden test, ported from the reference's inline test
(dw-experiments/2020-09-03/script/merge.py:107-135)."""

from dygiepp_ray.stages.coref import drop_contained, merge_clusters


def test_reference_golden_merge():
    doc1 = [
        [[12, 14], [15, 17]],
        [[1, 3], [34, 37], [67, 69]],
        [[21, 25], [66, 68]],
        [[104, 106], [108, 110]],
        [[305, 309], [310, 312], [314, 316]],
        [[406, 411], [413, 416], [420, 422]],
    ]
    doc2 = [
        [[2, 6], [12, 14], [21, 25]],
        [[55, 58], [61, 63], [88, 92]],
        [[104, 106], [112, 114]],
        [[108, 110], [120, 122]],
        [[205, 209], [210, 212], [214, 216]],
        [[398, 401], [406, 408], [420, 422]],
    ]
    expected = [
        [[2, 6], [12, 14], [15, 17], [21, 25], [66, 68]],
        [[104, 106], [108, 110], [112, 114], [120, 122]],
        [[398, 401], [406, 411], [413, 416], [420, 422]],
    ]
    assert merge_clusters(doc1, doc2) == expected


def test_unmerged_clusters_dropped():
    # only clusters that participated in a merge are emitted (merge.py:85-95)
    out = merge_clusters([[[1, 2], [5, 6]]], [[[10, 11], [20, 21]]])
    assert out == []


def test_containment_dedup():
    assert drop_contained([(1, 5), (2, 3), (7, 8)]) == [(1, 5), (7, 8)]
    # equal spans are kept (not self-contained)
    assert drop_contained([(1, 5), (1, 5)]) == [(1, 5)]


def test_stale_worklist_entries_still_link():
    # the reference worklist keeps the pre-merge cluster in its queue, so a
    # span dropped by containment dedup ([6,9] ⊂ [5,10]) can STILL link the
    # third cluster via the stale entry — traced from merge.py:62-88.
    a = [[[5, 10]], [[5, 10], [6, 9]]]
    b = [[[6, 9], [50, 52]]]
    assert merge_clusters(a, b) == [[[5, 10], [50, 52]]]
