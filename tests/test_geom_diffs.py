"""Port of /root/reference/test_geom.rb — relation geometry diff
roundtrips + the partial-insertion deferred-state regression."""

import pytest

from openstreetmap_license_change_spark.core.geom import RelationDiff, geom_diff
from openstreetmap_license_change_spark.core.model import relation

W = "way"


def rel(members):
    return relation(0, 0, [(W, m[0], m[1] if len(m) > 1 else "") for m in members])


def check_diff_apply(member_lists):
    geoms = [rel(m) for m in member_lists]
    cur = list(geoms[0].geom)
    for a, b in zip(geoms, geoms[1:]):
        d = geom_diff(a, b)
        cur = d.apply(cur)
        assert cur == b.geom


def test_relation_diff_inserts():  # test_geom.rb:18-26
    check_diff_apply([
        [],
        [(29336166,)],
        [(29336166,), (29377987,)],
        [(9650915,), (29336166,), (29377987,)],
        [(9650915,), (29336166,), (29377987,), (29335519,)],
    ])


def test_relation_diff_deletes():  # test_geom.rb:28-36
    check_diff_apply([
        [(9650915,), (29336166,), (29377987,), (29335519,)],
        [(9650915,), (29336166,), (29377987,)],
        [(29336166,), (29377987,)],
        [(29336166,)],
        [],
    ])


def test_relation_diff_inserts_and_deletes():  # test_geom.rb:38-46
    check_diff_apply([
        [],
        [(9650915,), (29336166,)],
        [(29336166,), (29377987,)],
        [(9650915,), (29336166,), (29377987,)],
        [(9650915,), (29377987,), (29335519,)],
    ])


def test_relation_diff_moves():  # test_geom.rb:48-57
    check_diff_apply([
        [(1,), (2,), (3,), (4,)],
        [(2,), (1,), (3,), (4,)],
        [(2,), (3,), (1,), (4,)],
        [(2,), (3,), (4,), (1,)],
        [(2,), (3,), (4,), (1,)],
        [(1,), (2,), (3,), (4,)],
    ])


def test_relation_diff_moves_reverse():  # test_geom.rb:59-67
    check_diff_apply([
        [(1,), (2,), (3,), (4,)],
        [(4,), (1,), (2,), (3,)],
        [(3,), (4,), (1,), (2,)],
        [(2,), (3,), (4,), (1,)],
        [(1,), (2,), (3,), (4,)],
    ])


@pytest.mark.parametrize(
    "lists",
    [
        # alter mid / front / back (test_geom.rb:69-91)
        [
            [(1,), (2, "foo123"), (3,)],
            [(1,), (2, "bar456"), (3,)],
            [(1,), (2, "bat789"), (3,)],
        ],
        [
            [(1, "foo123"), (2,), (3,)],
            [(1, "bar456"), (2,), (3,)],
            [(1, "bat789"), (2,), (3,)],
        ],
        [
            [(1,), (2,), (3, "foo123")],
            [(1,), (2,), (3, "bar456")],
            [(1,), (2,), (3, "bat789")],
        ],
    ],
)
def test_relation_diff_alter(lists):
    check_diff_apply(lists)


def test_relation_partial_insertion():  # test_geom.rb:97-116
    geoms = [
        rel([(1,), (3,)]),
        rel([(1,), (2,), (3,)]),
        rel([(1,), (2,)]),
        rel([(1,), (3,)]),
    ]
    diffs = [geom_diff(a, b) for a, b in zip(geoms, geoms[1:])]
    g = list(geoms[0].geom)

    state: list = []
    g = diffs[0].apply(g, only_deleted=True, state=state)
    g = diffs[1].apply(g, state=state)
    g = diffs[2].apply(g, state=state)

    # the decliner's inserted way 2 is deleted by the final diff, so the
    # result matches the first version: ways 1 & 3
    assert g == rel([(1,), (3,)]).geom
