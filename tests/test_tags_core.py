"""Ports of the reference's tag-layer tests.

Covers test_tags_lowlevel.rb (diff partition + apply/reverse),
test_abbrev.rb (equal/unequal expansion pairs), and the significance
case tables embedded in test_tags.rb.
"""

import pytest

from openstreetmap_license_change_spark.core.abbrev import equal_expansions
from openstreetmap_license_change_spark.core.tags import (
    TagDiff,
    levenshtein,
    odbl_clean,
    significant_tag,
)


# -- test_tags_lowlevel.rb:10-80 ----------------------------------------------
def test_create_detection():
    d = TagDiff.create({}, {"foo": "bar"})
    assert (d.unchanged, d.created, d.deleted, d.edited, d.moved) == (
        {}, {"foo": "bar"}, {}, {}, {},
    )


def test_create_detection_with_existing():
    d = TagDiff.create({"foo": "bar"}, {"foo": "bar", "bar": "bat"})
    assert (d.unchanged, d.created, d.deleted, d.edited, d.moved) == (
        {"foo": "bar"}, {"bar": "bat"}, {}, {}, {},
    )


def test_deletion():
    d = TagDiff.create({"foo": "bar"}, {})
    assert (d.unchanged, d.created, d.deleted, d.edited, d.moved) == (
        {}, {}, {"foo": "bar"}, {}, {},
    )


def test_deletion_with_existing():
    d = TagDiff.create({"foo": "bar", "bar": "bat"}, {"foo": "bar"})
    assert (d.unchanged, d.created, d.deleted, d.edited, d.moved) == (
        {"foo": "bar"}, {}, {"bar": "bat"}, {}, {},
    )


def test_edited():
    d = TagDiff.create({"foo": "bar"}, {"foo": "baz"})
    assert d.edited == {"foo": ("bar", "baz")}
    assert (d.unchanged, d.created, d.deleted, d.moved) == ({}, {}, {}, {})


def test_edited_with_existing():
    d = TagDiff.create({"foo": "bar", "bar": "bat"}, {"foo": "baz", "bar": "bat"})
    assert d.unchanged == {"bar": "bat"}
    assert d.edited == {"foo": ("bar", "baz")}


def test_moved():
    d = TagDiff.create({"foo": "bar"}, {"foop": "bar"})
    assert d.moved == {("foo", "foop"): "bar"}
    assert (d.unchanged, d.created, d.deleted, d.edited) == ({}, {}, {}, {})


def test_moved_with_existing():
    d = TagDiff.create({"foo": "bar", "bar": "bat"}, {"foop": "bar", "bar": "bat"})
    assert d.unchanged == {"bar": "bat"}
    assert d.moved == {("foo", "foop"): "bar"}


OLD = {"foo": "bar!", "foop": "bar_asdfgh", "bar": "baz", "baz": "bat"}
NEW = {"foop": "bar_qwerty", "bark": "baz", "baz": "bat", "new": "shoes"}


def test_apply():  # test_tags_lowlevel.rb:82-102
    d = TagDiff.create(OLD, NEW)
    assert d.unchanged == {"baz": "bat"}
    assert d.created == {"new": "shoes"}
    assert d.deleted == {"foo": "bar!"}
    assert d.edited == {"foop": ("bar_asdfgh", "bar_qwerty")}
    assert d.moved == {("bar", "bark"): "baz"}
    assert d.apply(OLD) == NEW


def test_apply_reverse():  # test_tags_lowlevel.rb:104-124
    d = TagDiff.create(OLD, NEW)
    assert d.reverse().apply(NEW) == OLD


# -- significance tables from test_tags.rb ------------------------------------
TRIVIAL_PAIRS = [
    # names (test_tags.rb:34-42)
    ("Oxford St", "Oxford Street"),
    ("Johnann Wolfgang von Goethe Allee", "Johann-Wolfgang-von-Goethe-Allee"),
    ("Mulberry Hiway", "Mulberry Highway"),
    ("old fen way", "Old Fen Way"),
    ("Lodnon", "London"),
    ("strasse", "Straße"),
    ("Supercalifragilisticexpialidocious Stret",
     "Supercalifragilisticexpialidocious Street"),
    # keys (test_tags.rb:100-105)
    ("nmae", "name"),
    ("addr:hosenumber", "addr:housenumber"),
    ("addr_housenumber", "addr:housenumber"),
    ("addr:housenummer", "addr:housenumber"),
    # refs (test_tags.rb:185-190)
    ("E16", "E 16"),
    ("1;R5", "R1;R5"),
    ("1;R5;R6", "R1;R5;R6"),
    ("Rv7", "RV7"),
]

SIGNIFICANT_PAIRS = [
    # test_tags.rb:124-129 and :150-155
    ("Oxford St", "Bedford St"),
    ("Johnann Wolfgang von Goethe Allee", "Johann-Sebastian-Bach-Allee"),
    ("Mulberry Hiway", "Blueberry Valley Drive"),
    ("улица Интернацион", "улица Бешенковичи"),
    ("Wellington Avenue", "Wellington Way"),
]


@pytest.mark.parametrize("old,new", TRIVIAL_PAIRS)
def test_trivial_pairs(old, new):
    assert significant_tag(old, new) is False


@pytest.mark.parametrize("old,new", SIGNIFICANT_PAIRS)
def test_significant_pairs(old, new):
    assert significant_tag(old, new) is True


# -- test_abbrev.rb:15-75 ------------------------------------------------------
EQUAL_ABBREVS = [
    ("Foobarbaz Rd", "Foobarbaz Rd"),
    ("Foobar Rd", "Foobar Road"),
    ("Foobar Road", "Foobar Rd"),
    ("E Foobar Wy", "East Foobar Way"),
    ("NE Foobar Crescent", "North East Foobar Cr."),
    ("NE Foobar Crescent", "North East Foobar Cr"),
    ("N.E. Foobar Crescent", "North East Foobar Cr"),
    ("NE Foobar Street", "Northeast Foobar St"),
    ("Foo & Bar", "Foo and Bar"),
    ("Foo&Bar", "Foo and Bar"),
    ("Foo&BarBaz", "Foo&BarBaz"),
    ("North & Western", "North and Western"),
    ("Doublespace  St", "Doublespace street"),
    ("New NW Route", "New North West Route"),
    ("The old road ", "The old road"),
    ("Foo cres.", "Foo cr"),
    # Russian
    ("бул. Космонавтов", "бульвар Космонавтов"),
    ("пр-кт. Надеяться", "проспект Надеяться"),
    # German
    ("Joh.-Seb.-Bach-Straße", "Johann-Sebastian-Bach-str."),
    ("Bettina-v-Arnim-Straße", "Bettina-von-Arnim-Straße"),
    ("Universität Münster", "Uni Münster"),
    ("Kindergarten Jahnstraße", "KiGa Jahnstraße"),
    ("Kl. Moor", "Kleines Moor"),
    ("Realschule Stralsund", "RS Stralsund"),
    ("Bgm. Willhelm str.", "Bürgermeister Willhelm straße"),
    ("Hubertus-Platz", "Hubertus-Pl."),
    ("Fachhochschule Bremen", "FH Bremen"),
    ("An der Bahn", "A. d. Bahn"),
    ("Groß Ippener", "Gr. Ippener"),
    ("Klein Ippener", "Kl Ippener"),
    ("Hansel & Gretzel", "Hansel und Gretzel"),
    ("Streitwagenwg", "Streitwagenweg"),
    ("Musterwg.", "Musterweg"),
    ("Herreng.", "Herrengasse"),
    ("Hauptstrasse", "Hauptstr."),
    ("Hauptstr.", "Hauptstraße"),
    ("Nürnbergerstraße", "Nürnberger Str."),
]

UNEQUAL_ABBREVS = [
    ("& & A & B &&", "A & B"),
    ("Foo & Bar", "Foo Bar"),
    ("Westminster st", "Westminster abby"),
    ("Camp east York", "Cape York"),
    ("Doctor Feelgood", "Drive Feelgood"),
    ("North & Western", "North and East"),
    ("ул. Космонавтов", "бульвар Космонавтов"),
    ("Klein Ippener", "Gr. Ippener"),
    ("der foo", "den foo"),
]


@pytest.mark.parametrize("a,b", EQUAL_ABBREVS)
def test_equal_expansions(a, b):
    assert equal_expansions(a, b) is True
    assert equal_expansions(b, a) is True


@pytest.mark.parametrize("a,b", UNEQUAL_ABBREVS)
def test_unequal_expansions(a, b):
    assert equal_expansions(a, b) is False
    assert equal_expansions(b, a) is False


# -- odbl tag test (tags.rb:21-41) ---------------------------------------------
def test_odbl_clean():
    assert odbl_clean({"odbl": "clean"})
    assert odbl_clean({"ODBL": "Clean"})
    assert odbl_clean({"obdl": "true"})
    assert odbl_clean({"oodbl": "1"})
    assert odbl_clean({"odbl": "yes"})
    assert odbl_clean({"odbl": "clear"})
    assert not odbl_clean({"odbl": "dirty"})
    assert not odbl_clean({"name": "clean"})
    assert not odbl_clean({})


def test_levenshtein():
    assert levenshtein("", "") == 0
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("abc", "abd") == 1
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
