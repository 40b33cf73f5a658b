"""Port of /root/reference/test_references.rb — cross-element cascade:
deleting unclean nodes edits/deletes referencing current ways/relations,
with deterministic changeset ordering."""

from openstreetmap_license_change_spark.core.history import (
    AgreementDB,
    ChangeBot,
    HistoryStore,
)
from openstreetmap_license_change_spark.core.model import (
    NODE,
    RELATION,
    WAY,
    DeleteAct,
    EditAct,
    node,
    relation,
    way,
)

CS = {1: True, 2: True, 3: False}


def run_bot(nodes=None, ways=None, relations=None, changesets=CS):
    store = HistoryStore(nodes=nodes, ways=ways, relations=relations)
    bot = ChangeBot(store, AgreementDB(changesets=changesets))
    bot.process_all()
    return bot.as_changeset()


def test_cascading_way_deletion():  # test_references.rb:18-42
    cs = run_bot(
        nodes={
            1: [node(1, 1, [0, 0], changeset_id=3)],
            2: [node(2, 1, [1, 1], changeset_id=1)],
        },
        ways={1: [way(1, 1, [1, 2], changeset_id=2)]},
    )
    assert cs == [DeleteAct(WAY, 1), DeleteAct(NODE, 1)]


def test_remove_dirty_node_from_way():  # test_references.rb:49-75
    cs = run_bot(
        nodes={
            1: [node(1, 1, [0, 0], changeset_id=3)],
            2: [node(2, 1, [1, 1], changeset_id=1)],
            3: [node(3, 1, [1, 1], changeset_id=1)],
        },
        ways={1: [way(1, 1, [1, 2, 3], changeset_id=2)]},
    )
    assert cs == [
        EditAct(way(1, 1, [2, 3], changeset_id=-1)),
        DeleteAct(NODE, 1),
    ]


def test_remove_dirty_node_from_way_twice():  # test_references.rb:81-107
    cs = run_bot(
        nodes={
            1: [node(1, 1, [0, 0], changeset_id=3)],
            2: [node(2, 1, [1, 1], changeset_id=1)],
            3: [node(3, 1, [1, 1], changeset_id=1)],
        },
        ways={1: [way(1, 1, [1, 2, 3, 1], changeset_id=2)]},
    )
    assert cs == [
        EditAct(way(1, 1, [2, 3], changeset_id=-1)),
        DeleteAct(NODE, 1),
    ]


def test_remove_two_nodes_for_different_reasons():  # test_references.rb:113-141
    cs = run_bot(
        nodes={
            1: [node(1, 1, [0, 0], changeset_id=3)],
            2: [node(2, 1, [1, 1], changeset_id=1)],
            3: [node(3, 1, [1, 1], changeset_id=1)],
            4: [node(4, 1, [1, 1], changeset_id=1)],
        },
        ways={
            1: [
                way(1, 1, [1, 2, 3], changeset_id=2),
                way(1, 2, [1, 2, 3, 4], changeset_id=3),
            ]
        },
    )
    assert cs == [
        EditAct(way(1, 2, [2, 3], changeset_id=-1)),
        DeleteAct(NODE, 1),
    ]


def test_remove_two_nodes_resulting_in_one_node_way():  # test_references.rb:147-174
    cs = run_bot(
        nodes={
            1: [node(1, 1, [0, 0], changeset_id=3)],
            2: [node(2, 1, [1, 1], changeset_id=1)],
            3: [node(3, 1, [1, 1], changeset_id=1)],
        },
        ways={
            1: [
                way(1, 1, [1, 2], changeset_id=2),
                way(1, 2, [1, 2, 3], changeset_id=3),
            ]
        },
    )
    assert cs == [DeleteAct(WAY, 1), DeleteAct(NODE, 1)]


def test_way_remains():  # test_references.rb:182-208
    cs = run_bot(
        nodes={
            1: [
                node(1, 1, [0, 0], changeset_id=1),
                node(1, 2, [2, 2], changeset_id=3),
            ],
            2: [node(2, 1, [1, 1], changeset_id=1)],
            3: [node(3, 1, [1, 1], changeset_id=1)],
        },
        ways={1: [way(1, 1, [1, 2, 3], changeset_id=2)]},
    )
    assert cs == [EditAct(node(1, 2, [0, 0], changeset_id=-1))]


def test_remove_dirty_node_from_relation():  # test_references.rb:215-241
    cs = run_bot(
        nodes={
            1: [node(1, 1, [0, 0], changeset_id=3)],
            2: [node(2, 1, [1, 1], changeset_id=1)],
            3: [node(3, 1, [1, 1], changeset_id=1)],
        },
        relations={
            1: [
                relation(
                    1, 1,
                    [(NODE, 1, "first"), (NODE, 2, "second"), (NODE, 3, "third")],
                    changeset_id=2,
                )
            ]
        },
    )
    assert cs == [
        EditAct(
            relation(1, 1, [(NODE, 2, "second"), (NODE, 3, "third")],
                     changeset_id=-1)
        ),
        DeleteAct(NODE, 1),
    ]


def test_empty_relation_deleted():  # test_references.rb:248-273
    cs = run_bot(
        nodes={
            1: [node(1, 1, [0, 0], changeset_id=3)],
            2: [node(2, 1, [1, 1], changeset_id=3)],
            3: [node(3, 1, [1, 1], changeset_id=3)],
        },
        relations={
            1: [
                relation(
                    1, 1,
                    [(NODE, 1, "first"), (NODE, 2, "second"), (NODE, 3, "third")],
                    changeset_id=2,
                )
            ]
        },
    )
    assert cs == [
        DeleteAct(RELATION, 1),
        DeleteAct(NODE, 1),
        DeleteAct(NODE, 2),
        DeleteAct(NODE, 3),
    ]


def test_remove_dirty_way_from_relation():  # test_references.rb:280-307
    cs = run_bot(
        nodes={
            1: [node(1, 1, [1, 1], changeset_id=1)],
            2: [node(2, 1, [1, 1], changeset_id=1)],
        },
        ways={1: [way(1, 1, [1, 2], changeset_id=3)]},
        relations={
            1: [
                relation(
                    1, 1,
                    [(NODE, 1, "first"), (NODE, 2, "second"), (WAY, 1, "third")],
                    changeset_id=2,
                )
            ]
        },
    )
    assert cs == [
        EditAct(
            relation(1, 1, [(NODE, 1, "first"), (NODE, 2, "second")],
                     changeset_id=-1)
        ),
        DeleteAct(WAY, 1),
    ]


def test_remove_dirty_node_from_way_and_way_from_relation():  # :315-344
    cs = run_bot(
        nodes={
            1: [node(1, 1, [0, 0], changeset_id=3)],
            2: [node(2, 1, [1, 1], changeset_id=1)],
        },
        ways={1: [way(1, 1, [1, 2], changeset_id=2)]},
        relations={
            1: [
                relation(
                    1, 1,
                    [(NODE, 1, "first"), (NODE, 2, "second"), (WAY, 1, "third")],
                    changeset_id=2,
                )
            ]
        },
    )
    assert cs == [
        EditAct(relation(1, 1, [(NODE, 2, "second")], changeset_id=-1)),
        DeleteAct(WAY, 1),
        DeleteAct(NODE, 1),
    ]


def test_remove_relations_in_order():  # test_references.rb:349-372
    cs = run_bot(
        changesets={1: False, 2: True},
        nodes={1: [node(1, 1, [0, 0], changeset_id=1)]},
        relations={
            1: [relation(1, 1, [(NODE, 1, "first")], changeset_id=2)],
            2: [relation(2, 1, [(RELATION, 1, "first")], changeset_id=2)],
        },
    )
    assert cs == [
        DeleteAct(RELATION, 2),
        DeleteAct(RELATION, 1),
        DeleteAct(NODE, 1),
    ]
