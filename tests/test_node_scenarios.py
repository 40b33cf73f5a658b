"""Port of /root/reference/test_node.rb — the node behavioral spec.

Changesets 1 & 2 are by agreers, changeset 3 by a decliner
(test_node.rb:19-25).  Each case asserts the exact ordered action list.
"""

import pytest

from openstreetmap_license_change_spark.core.history import (
    AgreementDB,
    element_actions,
)
from openstreetmap_license_change_spark.core.model import (
    NODE,
    DeleteAct,
    EditAct,
    RedactAct,
    node,
)

DB = AgreementDB(changesets={1: True, 2: True, 3: False})


def actions_for(history):
    return element_actions(history, DB)


def edit(element_id, version, lonlat, tags=None):
    return EditAct(
        node(element_id, version, lonlat, changeset_id=-1, tags=tags or {})
    )


def test_simple_node_clean():  # test_node.rb:29-35
    history = [
        node(1, 1, [0, 0], changeset_id=1),
        node(1, 2, [0, 0], changeset_id=2),
    ]
    assert actions_for(history) == []


def test_simple_node_unclean():  # test_node.rb:39-48
    history = [node(1, 1, [0, 0], changeset_id=3)]
    assert actions_for(history) == [
        DeleteAct(NODE, 1),
        RedactAct(NODE, 1, 1, "hidden"),
    ]


def test_simple_node_unclean_multiple_edit():  # test_node.rb:53-62
    history = [
        node(1, 1, [0, 0], changeset_id=3),
        node(1, 2, [0, 0], changeset_id=3),
    ]
    assert actions_for(history) == [
        DeleteAct(NODE, 1),
        RedactAct(NODE, 1, 1, "hidden"),
        RedactAct(NODE, 1, 2, "visible"),
    ]


def test_simple_node_unclean_edited_clean_later():  # test_node.rb:69-78
    history = [
        node(1, 1, [0, 0], changeset_id=3),
        node(1, 2, [0, 0], changeset_id=1),
    ]
    assert actions_for(history) == [
        DeleteAct(NODE, 1),
        RedactAct(NODE, 1, 1, "hidden"),
        RedactAct(NODE, 1, 2, "visible"),
    ]


def test_simple_node_unclean_edited_clean_later_tags():  # test_node.rb:82-91
    history = [
        node(1, 1, [0, 0], changeset_id=3),
        node(1, 2, [0, 0], changeset_id=1, tags={"foo": "bar"}),
    ]
    assert actions_for(history) == [
        DeleteAct(NODE, 1),
        RedactAct(NODE, 1, 1, "hidden"),
        RedactAct(NODE, 1, 2, "visible"),
    ]


def test_simple_node_unclean_edited_clean_later_position():  # test_node.rb:95-102
    history = [
        node(1, 1, [0, 0], changeset_id=3),
        node(1, 2, [1, 1], changeset_id=1),
    ]
    assert actions_for(history) == [RedactAct(NODE, 1, 1, "hidden")]


def test_unclean_edited_clean_later_position_with_tags():  # test_node.rb:107-116
    history = [
        node(1, 1, [0, 0], changeset_id=3, tags={"foo": "bar"}),
        node(1, 2, [1, 1], changeset_id=1, tags={"foo": "bar"}),
    ]
    assert actions_for(history) == [
        edit(1, 2, [1, 1]),
        RedactAct(NODE, 1, 1, "hidden"),
        RedactAct(NODE, 1, 2, "visible"),
    ]


def test_unclean_edited_clean_later_position_good_and_bad_tags():  # :119-128
    history = [
        node(1, 1, [0, 0], changeset_id=3, tags={"foo": "bar"}),
        node(1, 2, [1, 1], changeset_id=1, tags={"foo": "bar", "fee": "fie"}),
    ]
    assert actions_for(history) == [
        edit(1, 2, [1, 1], {"fee": "fie"}),
        RedactAct(NODE, 1, 1, "hidden"),
        RedactAct(NODE, 1, 2, "visible"),
    ]


def test_unclean_clean_later_position_bad_tag_trivial_change():  # :131-140
    history = [
        node(1, 1, [0, 0], changeset_id=3, tags={"foo": "bars"}),
        node(1, 2, [1, 1], changeset_id=1, tags={"foo": "bar's"}),
    ]
    assert actions_for(history) == [
        edit(1, 2, [1, 1]),
        RedactAct(NODE, 1, 1, "hidden"),
        RedactAct(NODE, 1, 2, "visible"),
    ]


def test_simple_node_clean_edited_unclean_later():  # test_node.rb:147-155
    history = [
        node(1, 1, [0, 0], changeset_id=1, tags={"foo": "bar"}),
        node(1, 2, [0, 0], changeset_id=3, tags={"foo": "blah"}),
    ]
    assert actions_for(history) == [
        edit(1, 2, [0, 0], {"foo": "bar"}),
        RedactAct(NODE, 1, 2, "hidden"),
    ]


def test_clean_edited_unclean_later_then_clean_again():  # test_node.rb:161-171
    history = [
        node(1, 1, [0, 0], changeset_id=1, tags={"foo": "bar"}),
        node(1, 2, [0, 0], changeset_id=3, tags={"foo": "blah"}),
        node(1, 3, [0, 0], changeset_id=2, tags={"foo": "blah", "bar": "blah"}),
    ]
    assert actions_for(history) == [
        edit(1, 3, [0, 0], {"foo": "bar", "bar": "blah"}),
        RedactAct(NODE, 1, 2, "hidden"),
        RedactAct(NODE, 1, 3, "visible"),
    ]


def test_node_move():  # test_node.rb:174-182
    history = [
        node(1, 1, [0, 0], changeset_id=1),
        node(1, 2, [1, 1], changeset_id=3),
    ]
    assert actions_for(history) == [
        edit(1, 2, [0, 0]),
        RedactAct(NODE, 1, 2, "hidden"),
    ]


def test_node_create_dirty_then_move_clean():  # test_node.rb:187-197
    history = [
        node(1, 1, [0, 0], changeset_id=3),
        node(1, 2, [1, 1], changeset_id=1),
    ]
    assert actions_for(history) == [RedactAct(NODE, 1, 1, "hidden")]


def test_node_tags_changed_later_restored():  # test_node.rb:203-210
    history = [
        node(1, 1, [0, 0], changeset_id=1, tags={"foo": "bar"}),
        node(1, 2, [0, 0], changeset_id=3, tags={"foo": "bar", "bar": "blah"}),
        node(1, 3, [0, 0], changeset_id=2, tags={"foo": "bar"}),
    ]
    assert actions_for(history) == [RedactAct(NODE, 1, 2, "hidden")]


def test_node_tags_removed_by_decliner():  # test_node.rb:213-219
    history = [
        node(1, 1, [0, 0], changeset_id=1, tags={"foo": "bar", "bar": "blah"}),
        node(1, 2, [0, 0], changeset_id=3, tags={"foo": "bar"}),
    ]
    assert actions_for(history) == []


def test_node_tags_cleaned_but_then_reverted_to_tainted():  # test_node.rb:225-236
    history = [
        node(1, 1, [0, 0], changeset_id=1, tags={"foo": "bar"}),
        node(1, 2, [0, 0], changeset_id=3, tags={"foo": "bar", "bar": "blah"}),
        node(1, 3, [0, 0], changeset_id=2, tags={"foo": "bar"}),
        node(1, 4, [0, 0], changeset_id=2, tags={"foo": "bar", "bar": "blah"}),
    ]
    assert actions_for(history) == [
        edit(1, 4, [0, 0], {"foo": "bar"}),
        RedactAct(NODE, 1, 2, "hidden"),
        RedactAct(NODE, 1, 4, "visible"),
    ]


def test_node_rollercoaster():  # test_node.rb:239-259
    history = [
        node(1, 1, [0, 0], changeset_id=3, tags={"foo": "bar"}),
        node(1, 2, [0, 0], changeset_id=3),
        node(1, 3, [1, 1], changeset_id=2, tags={"bar": "baz"}),
        node(1, 4, [1, 1], changeset_id=3, tags={"rose": "red", "bar": "baz"}),
        node(1, 5, [1, 1], changeset_id=2,
             tags={"rose": "red", "bar": "baz", "dapper": "mapper"}),
        node(1, 6, [2, 2], changeset_id=3,
             tags={"rose": "red", "bar": "baz", "dapper": "mapper"}),
        node(1, 7, [2, 2], changeset_id=2,
             tags={"rose": "red", "bar": "baz", "dapper": "mapper", "e": "mc**2"}),
        node(1, 8, [2, 2], changeset_id=2,
             tags={"rose": "red", "bar": "baz", "dapper": "mapper", "e": "mc**2",
                   "foo": "bar"}),
    ]
    assert actions_for(history) == [
        edit(1, 8, [1, 1], {"bar": "baz", "dapper": "mapper", "e": "mc**2"}),
        RedactAct(NODE, 1, 1, "hidden"),
        RedactAct(NODE, 1, 2, "visible"),
        RedactAct(NODE, 1, 4, "hidden"),
        RedactAct(NODE, 1, 5, "visible"),
        RedactAct(NODE, 1, 6, "hidden"),
        RedactAct(NODE, 1, 7, "visible"),
        RedactAct(NODE, 1, 8, "visible"),
    ]


def test_node_reformed_ccoholic_simple():  # test_node.rb:265-285
    history = [
        node(1, 1, [0, 0], changeset_id=3, tags={"foo": "bar"}),
        node(1, 2, [0, 0], changeset_id=3),
        node(1, 3, [0, 0], changeset_id=3, tags={"sugar": "sweet"}),
        node(1, 4, [1, 1], changeset_id=2, tags={"sugar": "sweet", "bar": "baz"}),
        node(1, 5, [1, 1], changeset_id=3,
             tags={"sugar": "sweet", "rose": "red", "bar": "baz"}),
        node(1, 6, [1, 1], changeset_id=2,
             tags={"sugar": "sweet", "bar": "baz", "dapper": "mapper"}),
        node(1, 7, [2, 2], changeset_id=1, tags={"bar": "baz", "dapper": "mapper"}),
        node(1, 8, [2, 2], changeset_id=2,
             tags={"bar": "baz", "dapper": "mapper", "e": "mc**2"}),
        node(1, 9, [2, 2], changeset_id=2,
             tags={"bar": "baz", "dapper": "mapper", "e": "mc**2",
                   "really": "fresh"}),
    ]
    assert actions_for(history) == [
        RedactAct(NODE, 1, 1, "hidden"),
        RedactAct(NODE, 1, 2, "visible"),
        RedactAct(NODE, 1, 3, "hidden"),
        RedactAct(NODE, 1, 4, "visible"),
        RedactAct(NODE, 1, 5, "hidden"),
        RedactAct(NODE, 1, 6, "visible"),
    ]


def test_node_reformed_ccoholic():  # test_node.rb:302-326
    history = [
        node(1, 1, [0, 0], changeset_id=3, tags={"foo": "bar"}),
        node(1, 2, [0, 0], changeset_id=3),
        node(1, 3, [0, 0], changeset_id=3, tags={"sugar": "sweet"}),
        node(1, 4, [1, 1], changeset_id=2, tags={"sugar": "sweet", "bar": "baz"}),
        node(1, 5, [1, 1], changeset_id=3,
             tags={"sugar": "sweet", "rose": "red", "bar": "baz"}),
        node(1, 6, [1, 1], changeset_id=2,
             tags={"sugar": "sweet", "bar": "baz", "dapper": "mapper"}),
        node(1, 7, [2, 2], changeset_id=1, tags={"bar": "baz", "dapper": "mapper"}),
        node(1, 8, [2, 2], changeset_id=2,
             tags={"bar": "baz", "dapper": "mapper", "e": "mc**2"}),
        node(1, 9, [2, 2], changeset_id=2,
             tags={"bar": "baz", "dapper": "mapper", "e": "mc**2", "foo": "bar"}),
    ]
    assert actions_for(history) == [
        edit(1, 9, [2, 2], {"bar": "baz", "dapper": "mapper", "e": "mc**2"}),
        RedactAct(NODE, 1, 1, "hidden"),
        RedactAct(NODE, 1, 2, "visible"),
        RedactAct(NODE, 1, 3, "hidden"),
        RedactAct(NODE, 1, 4, "visible"),
        RedactAct(NODE, 1, 5, "hidden"),
        RedactAct(NODE, 1, 6, "visible"),
        RedactAct(NODE, 1, 9, "visible"),
    ]


def test_node_reformed_ccoholic_too_hasty():  # test_node.rb:331-355
    history = [
        node(1, 1, [0, 0], changeset_id=3, tags={"foo": "bar"}),
        node(1, 2, [0, 0], changeset_id=3, tags={"foo": "bar", "diddle": "dum"}),
        node(1, 3, [0, 0], changeset_id=3,
             tags={"foo": "bar", "diddle": "dum", "sugar": "sweet"}),
        node(1, 4, [1, 1], changeset_id=2,
             tags={"foo": "bar", "diddle": "dum", "sugar": "sweet", "bar": "baz"}),
        node(1, 5, [1, 1], changeset_id=3,
             tags={"foo": "bar", "diddle": "dum", "sugar": "sweet", "bar": "baz",
                   "rose": "red"}),
        node(1, 6, [1, 1], changeset_id=2, tags={"bar": "baz", "dapper": "mapper"}),
        node(1, 7, [2, 2], changeset_id=2,
             tags={"bar": "baz", "dapper": "mapper", "foo": "bar"}),
        node(1, 8, [2, 2], changeset_id=2,
             tags={"bar": "baz", "dapper": "mapper", "e": "mc**2", "foo": "bar"}),
        node(1, 9, [2, 2], changeset_id=2,
             tags={"bar": "baz", "dapper": "mapper", "e": "mc**2", "foo": "bar",
                   "bored": "yet?"}),
    ]
    assert actions_for(history) == [
        edit(1, 9, [2, 2],
             {"bar": "baz", "dapper": "mapper", "e": "mc**2", "bored": "yet?"}),
        RedactAct(NODE, 1, 1, "hidden"),
        RedactAct(NODE, 1, 2, "hidden"),
        RedactAct(NODE, 1, 3, "hidden"),
        RedactAct(NODE, 1, 4, "visible"),
        RedactAct(NODE, 1, 5, "hidden"),
        RedactAct(NODE, 1, 7, "visible"),
        RedactAct(NODE, 1, 8, "visible"),
        RedactAct(NODE, 1, 9, "visible"),
    ]


def test_unclean_clean_later_position_bad_tag_changed():  # test_node.rb:370-379
    history = [
        node(1, 1, [0, 0], changeset_id=3, tags={"wibble": "wobble", "foo": "bar"}),
        node(1, 2, [1, 1], changeset_id=1,
             tags={"wibble": "wobble", "foo": "feefie"}),
    ]
    assert actions_for(history) == [
        edit(1, 2, [1, 1], {"foo": "feefie"}),
        RedactAct(NODE, 1, 1, "hidden"),
        RedactAct(NODE, 1, 2, "visible"),
    ]


def test_node_no_change():  # test_node.rb:382-388
    history = [
        node(1, 1, [0, 0], changeset_id=1, tags={"foo": "bar"}),
        node(1, 2, [0, 0], changeset_id=3, tags={"foo": "bar"}),
    ]
    assert actions_for(history) == []


def test_node_update_created_by():  # test_node.rb:393-400
    history = [
        node(1, 1, [0, 0], changeset_id=1, tags={"created_by": "Potlatch"}),
        node(1, 2, [0, 0], changeset_id=3,
             tags={"created_by": "JOSM", "name": "foo"}),
    ]
    assert actions_for(history) == [
        edit(1, 2, [0, 0]),
        RedactAct(NODE, 1, 2, "hidden"),
    ]


def test_node_fp_bug():  # test_node.rb:403-411
    history = [
        node(1, 1, [0.1234567, 0], changeset_id=3, tags={"created_by": "JOSM"}),
        node(1, 2, [0.1234566, 0], changeset_id=1,
             tags={"created_by": "Potlatch 1.4", "name": "foo"}),
    ]
    assert actions_for(history) == [
        DeleteAct(NODE, 1),
        RedactAct(NODE, 1, 1, "hidden"),
        RedactAct(NODE, 1, 2, "visible"),
    ]


def test_node_fp_bug2():  # test_node.rb:413-420
    history = [
        node(1, 1, [0.1234567, 0], changeset_id=1, tags={"created_by": "JOSM"}),
        node(1, 2, [0.1234566, 0], changeset_id=3,
             tags={"created_by": "Potlatch 1.4"}),
    ]
    assert actions_for(history) == []


def test_node_wrong_redaction():  # test_node.rb:423-431
    history = [
        node(1, 1, [49.8898997, 1.9707186], changeset_id=1),
        node(1, 2, [49.8898998, 1.9707185], changeset_id=3),
        node(1, 3, [49.8898998, 1.9707185], changeset_id=2),
    ]
    assert actions_for(history) == []
