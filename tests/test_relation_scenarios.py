"""Port of /root/reference/test_relation.rb — relation behavioral spec
(member-list OT with alter/move detection + multipolygon bag semantics)."""

from openstreetmap_license_change_spark.core.history import (
    AgreementDB,
    element_actions,
)
from openstreetmap_license_change_spark.core.model import (
    RELATION,
    DeleteAct,
    EditAct,
    RedactAct,
    relation,
)

DB = AgreementDB(changesets={1: True, 2: True, 3: False})

W = "way"
N = "node"


def actions_for(history):
    return element_actions(history, DB)


def rel(element_id, version, members, changeset_id, tags=None, visible=True):
    return relation(
        element_id, version, members,
        changeset_id=changeset_id, tags=tags or {}, visible=visible,
    )


def edit(element_id, version, members, tags=None):
    return EditAct(
        relation(element_id, version, members, changeset_id=-1, tags=tags or {})
    )


def test_relation_simple():  # test_relation.rb:20-30
    history = [rel(1, 1, [(W, 1, ""), (W, 2, "")], 3, {"type": "route"})]
    assert actions_for(history) == [
        DeleteAct(RELATION, 1),
        RedactAct(RELATION, 1, 1, "hidden"),
    ]


def test_relation_simple_keep():  # test_relation.rb:32-40
    history = [rel(1, 1, [(W, 1, ""), (W, 2, "")], 1, {"type": "route"})]
    assert actions_for(history) == []


def test_relation_members_added():  # test_relation.rb:44-55
    history = [
        rel(1, 1, [(W, 1, ""), (W, 2, "")], 3, {"type": "route"}),
        rel(1, 2, [(W, 1, ""), (W, 4, ""), (W, 2, "")], 2, {"type": "route"}),
        rel(1, 3, [(W, 1, ""), (W, 4, ""), (W, 2, ""), (W, 3, "")], 1,
            {"type": "route"}),
    ]
    assert actions_for(history) == [
        edit(1, 3, [(W, 4, ""), (W, 3, "")], {"type": "route"}),
        RedactAct(RELATION, 1, 1, "hidden"),
        RedactAct(RELATION, 1, 2, "visible"),
        RedactAct(RELATION, 1, 3, "visible"),
    ]


def test_relation_role_changed():  # test_relation.rb:58-66
    history = [
        rel(1, 1, [(W, 1, "outer"), (W, 2, "")], 1, {"type": "multipolygon"}),
        rel(1, 2, [(W, 1, "outer"), (W, 2, "inner")], 3, {"type": "multipolygon"}),
    ]
    assert actions_for(history) == [
        edit(1, 2, [(W, 1, "outer"), (W, 2, "")], {"type": "multipolygon"}),
        RedactAct(RELATION, 1, 2, "hidden"),
    ]


def test_relation_role_edited_reverted():  # test_relation.rb:69-76
    history = [
        rel(1, 1, [(W, 1, "outer"), (W, 2, "inner")], 1, {"type": "multipolygon"}),
        rel(1, 2, [(W, 1, "outer"), (W, 2, "aaaaa")], 3, {"type": "multipolygon"}),
        rel(1, 3, [(W, 1, "outer"), (W, 2, "inner")], 1, {"type": "multipolygon"}),
    ]
    assert actions_for(history) == [RedactAct(RELATION, 1, 2, "hidden")]


def test_relation_member_deleted_by_decliner():  # test_relation.rb:79-85
    history = [
        rel(1, 1, [(W, 1, ""), (W, 2, "")], 1, {"type": "multipolygon"}),
        rel(1, 2, [(W, 1, "")], 3, {"type": "multipolygon"}),
    ]
    assert actions_for(history) == []


def test_relation_member_deleted_readded():  # test_relation.rb:89-96
    history = [
        rel(1, 1, [(W, 1, ""), (W, 2, "")], 1, {"type": "multipolygon"}),
        rel(1, 2, [(W, 1, "")], 3, {"type": "multipolygon"}),
        rel(1, 3, [(W, 1, ""), (W, 2, "")], 1, {"type": "multipolygon"}),
    ]
    assert actions_for(history) == []


def test_relation_attributes_marked_clean():  # test_relation.rb:99-106
    history = [
        rel(1, 1, [(W, 1, "")], 1, {"type": "multipolygon"}),
        rel(1, 2, [(W, 1, "")], 3, {"type": "unipolygon"}),
        rel(1, 3, [(W, 1, "")], 1, {"type": "unipolygon", "odbl": "clean"}),
    ]
    assert actions_for(history) == [RedactAct(RELATION, 1, 2, "hidden")]


def test_member_role_marked_clean():  # test_relation.rb:109-116
    history = [
        rel(1, 1, [(W, 1, "")], 1, {"type": "multipolygon"}),
        rel(1, 2, [(W, 1, "aaa")], 3, {"type": "multipolygon"}),
        rel(1, 3, [(W, 1, "aaa")], 1, {"type": "multipolygon", "odbl": "clean"}),
    ]
    assert actions_for(history) == [RedactAct(RELATION, 1, 2, "hidden")]


def test_relation_attribute_changed_then_deleted():  # test_relation.rb:119-126
    history = [
        rel(1, 1, [(W, 1, ""), (W, 2, "")], 1, {"type": "multipolygon"}),
        rel(1, 2, [(W, 1, ""), (W, 2, "aaa")], 3, {"type": "multipolygon"}),
        rel(1, 3, [(W, 1, "")], 1, {"type": "multipolygon"}),
    ]
    assert actions_for(history) == [RedactAct(RELATION, 1, 2, "hidden")]


def test_relation_order_changed():  # test_relation.rb:134-142
    history = [
        rel(1, 1, [(W, 1, ""), (W, 4, ""), (W, 2, ""), (W, 3, "")], 1,
            {"type": "route"}),
        rel(1, 2, [(W, 1, ""), (W, 2, ""), (W, 3, ""), (W, 4, "")], 3,
            {"type": "route"}),
    ]
    assert actions_for(history) == [
        edit(1, 2, [(W, 1, ""), (W, 4, ""), (W, 2, ""), (W, 3, "")],
             {"type": "route"}),
        RedactAct(RELATION, 1, 2, "hidden"),
    ]


def test_relation_order_changed_then_member_appended():  # test_relation.rb:153-163
    history = [
        rel(1, 1, [(W, 1, ""), (W, 4, ""), (W, 2, ""), (W, 3, "")], 1,
            {"type": "route"}),
        rel(1, 2, [(W, 1, ""), (W, 2, ""), (W, 3, ""), (W, 4, "")], 3,
            {"type": "route"}),
        rel(1, 3, [(W, 1, ""), (W, 2, ""), (W, 3, ""), (W, 4, ""), (W, 5, "")], 2,
            {"type": "route"}),
    ]
    assert actions_for(history) == [
        edit(1, 3, [(W, 1, ""), (W, 4, ""), (W, 2, ""), (W, 3, ""), (W, 5, "")],
             {"type": "route"}),
        RedactAct(RELATION, 1, 2, "hidden"),
        RedactAct(RELATION, 1, 3, "visible"),
    ]


def test_relation_members_added_then_removed():  # test_relation.rb:167-176
    history = [
        rel(1, 1, [(W, 1, ""), (W, 2, "")], 3, {"type": "route"}),
        rel(1, 2, [(W, 2, ""), (W, 3, ""), (W, 4, "")], 2, {"type": "route"}),
        rel(1, 3, [(W, 4, "")], 1, {"type": "route"}),
    ]
    assert actions_for(history) == [
        RedactAct(RELATION, 1, 1, "hidden"),
        RedactAct(RELATION, 1, 2, "visible"),
    ]


def test_relation_members_added_by_decliner():  # test_relation.rb:180-190
    history = [
        rel(1, 1, [(W, 3, "")], 1),
        rel(1, 2, [(W, 1, ""), (W, 3, "")], 3),
        rel(1, 3, [(W, 1, ""), (W, 2, ""), (W, 3, "")], 2),
    ]
    assert actions_for(history) == [
        edit(1, 3, [(W, 2, ""), (W, 3, "")]),
        RedactAct(RELATION, 1, 2, "hidden"),
        RedactAct(RELATION, 1, 3, "visible"),
    ]


def test_relation_members_added_then_moved():  # test_relation.rb:192-202
    history = [
        rel(1, 1, [(W, 2, ""), (W, 3, "")], 1),
        rel(1, 2, [(W, 1, ""), (W, 2, ""), (W, 3, "")], 3),
        rel(1, 3, [(W, 3, ""), (W, 1, ""), (W, 2, "")], 2),
    ]
    assert actions_for(history) == [
        edit(1, 3, [(W, 3, ""), (W, 2, "")]),
        RedactAct(RELATION, 1, 2, "hidden"),
        RedactAct(RELATION, 1, 3, "visible"),
    ]


def test_sorting_multipolygon_members():  # test_relation.rb:205-212
    history = [
        rel(1, 1, [(W, 1, ""), (N, 2, "")], 1, {"type": "multipolygon"}),
        rel(1, 2, [(N, 2, ""), (W, 1, "")], 2, {"type": "multipolygon"}),
        rel(1, 3, [(W, 1, ""), (N, 2, "")], 3, {"type": "multipolygon"}),
    ]
    assert actions_for(history) == []


def test_sorting_multipolygon_retag():  # test_relation.rb:215-223
    history = [
        rel(1, 1, [(W, 1, ""), (W, 2, "")], 1, {"type": "multipolygon"}),
        rel(1, 2, [(W, 2, ""), (W, 1, "")], 3, {"type": "route"}),
    ]
    assert actions_for(history) == [
        edit(1, 2, [(W, 1, ""), (W, 2, "")], {"type": "multipolygon"}),
        RedactAct(RELATION, 1, 2, "hidden"),
    ]


def test_relation_delete():  # test_relation.rb:226-235
    history = [
        rel(1, 1, [(W, 1, "")], 3),
        rel(1, 2, [], 1, visible=False),
        rel(1, 3, [(W, 1, ""), (W, 2, "")], 2),
        rel(1, 4, [(W, 1, "")], 3),
    ]
    assert actions_for(history) == [RedactAct(RELATION, 1, 1, "hidden")]
