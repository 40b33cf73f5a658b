"""Ports of test_odbl_tag.rb (odbl=clean semantics) and
test_exceptions.rb (exclusion list + per-version whitelist)."""

import pytest

from openstreetmap_license_change_spark.core.history import (
    AgreementDB,
    ChangeBot,
    HistoryStore,
    element_actions,
)
from openstreetmap_license_change_spark.core.model import (
    NODE,
    DeleteAct,
    EditAct,
    RedactAct,
    node,
)

CS = {1: True, 2: True, 3: False}


def edit(element_id, version, lonlat, tags=None):
    return EditAct(
        node(element_id, version, lonlat, changeset_id=-1, tags=tags or {})
    )


# -- test_odbl_tag.rb:25-111 ---------------------------------------------------
@pytest.mark.parametrize(
    "k,v",
    [
        ("odbl", "clean"), ("ODbL", "Clean"), ("oDbL", "yEs"),
        ("oDbL", "TrUe"), ("oDbL", "1"), ("odbl", "clear"),
        ("obdl", "clean"), ("oodbl", "clean"),
    ],
)
def test_node_odbl_clean_variants(k, v):
    db = AgreementDB(changesets=CS)
    history = [
        node(1, 1, [0, 0], changeset_id=1),
        node(1, 2, [0, 0], changeset_id=3, tags={"foo": "bar"}),
        node(1, 3, [0, 0], changeset_id=2, tags={"foo": "bar", k: v}),
    ]
    assert element_actions(history, db) == [RedactAct(NODE, 1, 2, "hidden")]


def test_node_odbl_clean_removed_and_reintroduced():  # test_odbl_tag.rb:129-141
    db = AgreementDB(changesets=CS)
    history = [
        node(1, 1, [0, 0], changeset_id=1),
        node(1, 2, [0, 0], changeset_id=3, tags={"foo": "bar"}),
        node(1, 3, [0, 0], changeset_id=2, tags={"foo": "bar", "odbl": "clean"}),
        node(1, 4, [0, 0], changeset_id=2, tags={"foo": "bar"}),
        node(1, 5, [0, 0], changeset_id=2, tags={"odbl": "clean"}),
    ]
    assert element_actions(history, db) == [
        RedactAct(NODE, 1, 2, "hidden"),
        RedactAct(NODE, 1, 3, "visible"),
        RedactAct(NODE, 1, 4, "visible"),
    ]


# -- test_exceptions.rb:33-66 ---------------------------------------------------
@pytest.mark.parametrize(
    "node_id,excluded",
    [(1, True), (2, True), (3, False), (4, True), (5, False)],
)
def test_ump_excluded_node(node_id, excluded):
    db = AgreementDB(
        changesets=CS,
        exclusions={(NODE, 1), (NODE, 2), (NODE, 4)},
    )
    store = HistoryStore()
    bot = ChangeBot(store, db)
    history = [
        node(node_id, 1, [0, 0], changeset_id=1, tags={"foo": "bar"}),
        node(node_id, 2, [1, 0], changeset_id=1, tags={"foo": "bar"}),
        node(node_id, 3, [1, 1], changeset_id=1,
             tags={"foo": "bar", "odbl": "clean"}),
    ]
    actions = bot.action_for(history)
    if excluded:
        assert actions == [
            DeleteAct(NODE, node_id),
            RedactAct(NODE, node_id, 1, "hidden"),
            RedactAct(NODE, node_id, 2, "hidden"),
            RedactAct(NODE, node_id, 3, "hidden"),
        ]
    else:
        assert actions == []


def test_whitelisted_node():  # test_exceptions.rb:68-90
    db = AgreementDB(
        changesets=CS,
        edit_whitelist={(NODE, 10, 1), (NODE, 11, 2)},
    )
    # node 10: creation whitelisted
    history = [
        node(10, 1, [0, 0], changeset_id=3, tags={"foo": "bar"}),
        node(10, 2, [1, 1], changeset_id=3, tags={"foo": "bar", "abc": "baz"}),
    ]
    assert element_actions(history, db) == [
        edit(10, 2, [0, 0], {"foo": "bar"}),
        RedactAct(NODE, 10, 2, "hidden"),
    ]
    # node 11: modification whitelisted
    history = [
        node(11, 1, [0, 0], changeset_id=3, tags={"foo": "bar"}),
        node(11, 2, [1, 1], changeset_id=3, tags={"foo": "bar", "abc": "baz"}),
    ]
    assert element_actions(history, db) == [
        edit(11, 2, [1, 1], {"abc": "baz"}),
        RedactAct(NODE, 11, 1, "hidden"),
        RedactAct(NODE, 11, 2, "visible"),
    ]
