"""Abbreviation-expansion equality.

Decides whether two strings are equal modulo abbreviation/expansion
("Foobar Rd" == "Foobar Road"), the reference's F7 kernel
(abbreviations.rb:9-342).  Fresh implementation: equivalence classes of
spellings compile to a substitution-rule map, and a bidirectional
best-first search (heapq keyed on matched-prefix length, with prefix
pruning against the target and a visited set for guaranteed
termination) looks for a rewrite of either string into the other.

Divergence from the reference, documented: the reference accidentally
unions its last equivalence class into the whitespace/dash/dot special
rules (abbreviations.rb:251-253 reuses a leaked loop variable), letting
a space be rewritten to "s"; we do not reproduce that bug.
"""

from __future__ import annotations

import heapq
from itertools import count

# Equivalence classes of spellings. Within one class every member may be
# rewritten to every other member. A spelling may appear in several
# classes (e.g. "dr" in drive/doctor); its substitution set is the union.
# Sources: USPS suffix abbreviations (EN), streetmangler locale list
# (RU), common German civic abbreviations — same public vocabularies the
# reference drew on (abbreviations.rb:6-241).
ABBREV_CLASSES: list[list[str]] = [
    # --- English (USPS-style suffixes + compass) ---
    ["alley", "aly"], ["and", "&"], ["annex", "anx"], ["arcade", "arc"],
    ["avenue", "ave"], ["beach", "bch"], ["boulevard", "blvd"],
    ["bend", "bnd"], ["branch", "br"], ["bridge", "brg"], ["brook", "brk"],
    ["bottom", "btm"], ["circle", "cir"], ["club", "clb"], ["cliff", "clf"],
    ["common", "cmn"], ["corner", "cor"], ["camp", "cp"], ["cape", "cpe"],
    ["crescent", "cr", "cres"], ["creek", "crk"], ["course", "crse"],
    ["crest", "crst"], ["causeway", "cswy"], ["court", "ct"],
    ["center", "ctr"], ["curve", "curv"], ["cove", "cv"], ["canyon", "cyn"],
    ["dale", "dl"], ["dam", "dm"], ["drive", "dr"], ["doctor", "dr"],
    ["divide", "dv"], ["east", "e"], ["estate", "est"],
    ["expressway", "expy"], ["extension", "ext"], ["field", "fld"],
    ["flat", "flt"], ["ford", "frd"], ["forge", "frg"], ["fork", "frk"],
    ["forest", "frst"], ["ferry", "fry"], ["fort", "ft"], ["freeway", "fwy"],
    ["garden", "gdn"], ["glen", "gln"], ["green", "grn"], ["grove", "grv"],
    ["gateway", "gtwy"], ["harbor", "hbr"], ["hill", "hl"],
    ["hollow", "holw"], ["haven", "hvn"], ["highway", "hwy"],
    ["inlet", "inlt"], ["island", "is"], ["junction", "jct"],
    ["knoll", "knl"], ["key", "ky"], ["lock", "lck"], ["lodge", "ldg"],
    ["lake", "lk"], ["lane", "ln"], ["landing", "lndg"], ["meadow", "mdw"],
    ["mill", "ml"], ["manor", "mnr"], ["mission", "msn"], ["mount", "mt"],
    ["mountain", "mtn"], ["motorway", "mtwy"], ["north", "n"],
    ["orchard", "orch"], ["parkway", "pkwy"], ["place", "pl"],
    ["plain", "pln"], ["plaza", "plz"], ["prairie", "pr"], ["port", "prt"],
    ["passage", "psge"], ["point", "pt"], ["radial", "radl"],
    ["road", "rd"], ["ridge", "rdg"], ["river", "riv"], ["ranch", "rnch"],
    ["rapid", "rpd"], ["rest", "rst"], ["route", "rte"], ["shoal", "shl"],
    ["shore", "shr"], ["skyway", "skwy"], ["south", "s"], ["summit", "smt"],
    ["spring", "spg"], ["square", "sq"], ["street", "st"],
    ["station", "sta"], ["stream", "strm"], ["terrace", "ter"],
    ["turnpike", "tpke"], ["track", "trak"], ["trace", "trce"],
    ["trail", "trl"], ["tunnel", "tunl"], ["union", "un"],
    ["viaduct", "via"], ["vista", "vis"], ["village", "vlg"],
    ["valley", "vly"], ["view", "vw"], ["way", "wy"], ["well", "wl"],
    ["west", "w"], ["crossing", "xing"], ["crossroad", "xrd"],
    # --- Russian (streetmangler locale classes) ---
    ["улица", "ул"], ["площадь", "пл"], ["переулок", "пер", "пер-к"],
    ["проезд", "пр-д"], ["шоссе", "ш"], ["бульвар", "бул", "б-р"],
    ["тупик", "туп"], ["набережная", "наб"],
    ["проспект", "просп", "пр-кт", "пр-т"], ["тракт", "тр-т", "тр"],
    ["эстакада", "эст"], ["район", "р-н"],
    ["микрорайон", "мкр-н", "мк-н", "мкр", "мкрн"],
    ["посёлок", "поселок", "пос"], ["деревня", "дер", "д"],
    ["квартал", "кв-л", "кв"],
    # --- German ---
    ["anschlussstelle", "as"], ["an", "a"], ["bahnhof", "bf"], ["bei", "b"],
    ["bürgermeister", "bgm"], ["der", "d"], ["den", "d"], ["dem", "d"],
    ["evangelische", "ev", "evang"], ["evangelischer", "ev", "evang"],
    ["evangelisches", "ev", "evang"], ["evangelisch", "ev", "evang"],
    ["fachhochschule", "fh"], ["gasse", "g"], ["gemeinschaft", "gem"],
    ["gemeinschafts", "gem"], ["georg", "gg"], ["groß", "gr"],
    ["große", "gr"], ["großer", "gr"], ["großes", "gr"],
    ["grundschule", "gs"], ["gymnasium", "gym", "gymn"],
    ["hauptbahnhof", "hbf"], ["hauptschule", "hs"], ["hochschule", "hs"],
    ["in", "i"], ["johann", "joh"], ["johannes", "joh"],
    ["katholische", "kath"], ["katholischer", "kath"],
    ["katholisches", "kath"], ["katholisch", "kath"],
    ["kindergarten", "kiga"], ["kindertagesstätte", "kita"],
    ["klein", "kl"], ["kleine", "kl"], ["kleiner", "kl"], ["kleines", "kl"],
    ["krankenhaus", "kh", "krkh", "krh", "krhs"], ["obere", "ob"],
    ["oberer", "ob"], ["oberes", "ob"], ["platz", "pl"],
    ["realschule", "rs"], ["römisch", "röm"], ["samtgemeinde", "sg"],
    ["sankt", "st"], ["sebastian", "seb"], ["straße", "str"],
    ["und", "u", "&"], ["universität", "uni"],
    ["unterer", "unt", "u"], ["unteres", "unt", "u"], ["untere", "unt", "u"],
    ["unter", "u"], ["vom", "v"], ["von", "v"], ["weg", "wg"],
    ["zur", "z"], ["zum", "z"], ["zu", "z"],
    # Swiss German
    ["strasse", "str"],
    # other
    ["ulica", "u"],
    # compass, reverse direction + German
    ["n", "north"], ["e", "east"], ["s", "south"], ["w", "west"],
    ["n", "nord"], ["o", "ost"], ["s", "süd"],
]


def _build_rules() -> dict[str, frozenset[str]]:
    rules: dict[str, set[str]] = {}
    for cls in ABBREV_CLASSES:
        for member in cls:
            rules.setdefault(member, set()).update(m for m in cls if m != member)
    # elision rules: spaces, dashes and dots may be dropped / traded
    # (abbreviations.rb:250-253, minus the leaked-variable bug)
    rules.setdefault(" ", set()).update({" ", "", "-", ".", ". "})
    rules.setdefault("-", set()).update({"-", " ", ""})
    rules.setdefault(".", set()).update({".", " ", ""})
    return {k: frozenset(v) for k, v in rules.items()}


RULES: dict[str, frozenset[str]] = _build_rules()
_SPECIALS = (" ", "-", ".")

# safety valve for adversarial inputs: bound total expansions per query;
# on hitting the cap we fall back to "not equal" (conservative =
# significant), cf. SURVEY.md §7.4 item 5.
MAX_EXPANSIONS = 200_000


def _mangle_next(heap, tie, visited, rules, target) -> bool:
    """Pop the best partial rewrite and expand it one substitution step.

    A state is (done, rest): ``done`` is a confirmed prefix of ``target``,
    ``rest`` the unprocessed remainder. Expansion splits ``rest`` at the
    first occurrence of a rule key and tries every substitute, plus a
    space-insertion variant (abbreviations.rb:257-301).
    """
    if not heap:
        return False
    _, _, (done, rest) = heapq.heappop(heap)
    for rule in rules:
        if len(rest) < len(rule):
            continue
        head, sep, tail = rest.partition(rule)
        if not sep:
            continue
        for sub in RULES[rule]:
            new_done = done + head + sub
            if not target.startswith(new_done):
                continue
            if target == new_done + tail:
                return True
            state = (new_done, tail)
            if state not in visited:
                visited.add(state)
                heapq.heappush(heap, (-len(new_done), next(tie), state))
            if rule != " ":
                spaced = " " + tail
                if target == new_done + spaced:
                    return True
                state = (new_done, spaced)
                if state not in visited:
                    visited.add(state)
                    heapq.heappush(heap, (-len(new_done), next(tie), state))
    return False


def equal_expansions(a: str, b: str) -> bool:
    """True when ``a`` can be rewritten into ``b`` (or vice versa) by
    abbreviation substitutions + space/dash/dot elision."""
    s1 = a.lower() + " "
    s2 = b.lower() + " "
    if s1 == s2:
        return True

    fwd_rules = [r for r in RULES if r in _SPECIALS or r in s1]
    bwd_rules = [r for r in RULES if r in _SPECIALS or r in s2]

    tie = count()
    fwd = [(0, next(tie), ("", s1))]
    bwd = [(0, next(tie), ("", s2))]
    seen_f: set = {("", s1)}
    seen_b: set = {("", s2)}

    budget = MAX_EXPANSIONS
    while (fwd or bwd) and budget > 0:
        budget -= 1
        if _mangle_next(fwd, tie, seen_f, fwd_rules, s2):
            return True
        if _mangle_next(bwd, tie, seen_b, bwd_rules, s1):
            return True
    return False
