#!/usr/bin/env python3
"""Port the reference's auto-generated golden tests
(/root/reference/test_auto.rb — real OSM element histories with
expected action lists) into a JSON fixture consumed by
tests/test_auto_golden.py.

The Ruby is machine-generated and highly regular; this parser handles
exactly that shape (element constructors, changeset fixture, expected
Edit/Redact/Delete lists) and fails loudly on anything else.
"""

from __future__ import annotations

import json
import re
import sys

SRC = "/root/reference/test_auto.rb"
OUT = "/root/repo/tests/fixtures/auto_cases.json"

# the reference's own known-failures quarantine (test_auto_fail.rb) —
# ported as xfail markers so divergence is documented mechanically
FAIL_SRC = "/root/reference/test_auto_fail.rb"
FAIL_OUT = "/root/repo/tests/fixtures/auto_fail_cases.json"


def find_balanced(s: str, start: int, open_ch="[", close_ch="]") -> int:
    """Index just past the bracket that closes s[start] (which must be
    open_ch). Tracks string literals."""
    assert s[start] == open_ch
    depth = 0
    i = start
    in_str = None
    while i < len(s):
        c = s[i]
        if in_str:
            if c == "\\":
                i += 2
                continue
            if c == in_str:
                in_str = None
        elif c == '"':
            in_str = c
        elif c == open_ch:
            depth += 1
        elif c == close_ch:
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unbalanced")


def unquote(tok: str):
    tok = tok.strip()
    if tok.startswith('"'):
        body = tok[1:-1]
        return body.replace('\\"', '"').replace("\\\\", "\\")
    if tok in ("true", "false"):
        return tok == "true"
    if tok == "nil":
        return None
    if re.fullmatch(r"-?\d+", tok):
        return int(tok)
    return float(tok)


PAIR_RE = re.compile(
    r'(?::(\w+)|"((?:[^"\\]|\\.)*)")\s*=>\s*'
    r'("(?:[^"\\]|\\.)*"|-?[\d.]+|true|false|nil)'
)

MEMBER_RE = re.compile(
    r'OSM::(Node|Way|Relation)\s*,\s*(\d+)\s*(?:,\s*"((?:[^"\\]|\\.)*)")?'
)


def parse_element(text: str) -> dict:
    """Parse `OSM::Node[[..], :id => .., "k" => "v"]` body text."""
    m = re.match(r"OSM::(Node|Way|Relation)\[", text)
    etype = m.group(1).lower()
    rest = text[m.end() - 1 :]  # starts at the constructor '['
    # geometry = first balanced [...] inside
    gstart = rest.index("[", 1)
    gend = find_balanced(rest, gstart)
    geom_text = rest[gstart:gend]
    attrs_text = rest[gend:-1]

    attrs: dict = {}
    tags: dict = {}
    for am in PAIR_RE.finditer(attrs_text):
        sym, skey, val = am.groups()
        v = unquote(val)
        if sym:
            attrs[sym] = v
        else:
            key = skey.replace('\\"', '"').replace("\\\\", "\\")
            tags[key] = v

    if etype == "node":
        body = geom_text[1:-1].strip()
        geom = [float(x) for x in body.split(",")] if body else None
    elif etype == "way":
        body = geom_text[1:-1].strip()
        geom = [int(x) for x in body.split(",")] if body else []
    else:
        geom = [
            [t.lower(), int(ref), role or ""]
            for t, ref, role in MEMBER_RE.findall(geom_text)
        ]
    return {"etype": etype, "geom": geom, "attrs": attrs, "tags": tags}


def parse_elements(block: str) -> list[dict]:
    out = []
    i = 0
    while True:
        m = re.search(r"OSM::(Node|Way|Relation)\[", block[i:])
        if not m:
            break
        start = i + m.start()
        bracket = i + m.end() - 1
        end = find_balanced(block, bracket)
        out.append(parse_element(block[start:end]))
        i = end
    return out


def parse_expected(block: str) -> list[dict]:
    out = []
    i = 0
    while i < len(block):
        m = re.search(r"\b(Edit|Redact|Delete)\[", block[i:])
        if not m:
            break
        kind = m.group(1)
        start = i + m.start()
        bracket = i + m.end() - 1
        end = find_balanced(block, bracket)
        body = block[start:end]
        if kind == "Edit":
            elems = parse_elements(body)
            assert len(elems) == 1, body
            out.append({"action": "edit", "obj": elems[0]})
        elif kind == "Redact":
            rm = re.match(
                r"Redact\[OSM::(Node|Way|Relation)\s*,\s*(\d+)\s*,\s*(\d+)\s*,"
                r"\s*:(\w+)\]",
                body,
            )
            out.append(
                {
                    "action": "redact",
                    "etype": rm.group(1).lower(),
                    "element_id": int(rm.group(2)),
                    "version": int(rm.group(3)),
                    "mode": rm.group(4),
                }
            )
        else:
            dm = re.match(
                r"Delete\[(?:klass=)?OSM::(Node|Way|Relation)\s*,\s*"
                r"(?:element_id=)?(\d+)\]",
                body,
            )
            out.append(
                {
                    "action": "delete",
                    "etype": dm.group(1).lower(),
                    "element_id": int(dm.group(2)),
                }
            )
        i = end
    return out


def strip_comments(src: str) -> str:
    """Remove `# ...` trailing comments, quote-aware (double quotes)."""
    out_lines = []
    for line in src.splitlines():
        in_str = False
        for i, c in enumerate(line):
            if c == '"' and (i == 0 or line[i - 1] != "\\"):
                in_str = not in_str
            elif c == "#" and not in_str:
                line = line[:i]
                break
        out_lines.append(line)
    return "\n".join(out_lines)


def main() -> int:
    rc = 0
    for src_path, out_path in ((SRC, OUT), (FAIL_SRC, FAIL_OUT)):
        rc |= port_file(src_path, out_path)
    return rc


def port_file(src_path: str, out_path: str) -> int:
    src = strip_comments(open(src_path, encoding="utf-8").read())

    changesets = {
        int(cid): agreed == "true"
        for cid, agreed in re.findall(
            r"(\d+)\s*=>\s*Changeset\[User\[(true|false)\]\]", src
        )
    }

    cases = []
    errors = []
    for tm in re.finditer(r"def (test_\w+)(.*?)\n  end\n", src, re.DOTALL):
        name, body = tm.group(1), tm.group(2)
        try:
            hist_start = body.index("history = [")
            hist_end = find_balanced(body, body.index("[", hist_start))
            history = parse_elements(body[hist_start:hist_end])

            exp_start = body.index("assert_equal([")
            exp_bracket = body.index("[", exp_start)
            exp_end = find_balanced(body, exp_bracket)
            expected = parse_expected(body[exp_bracket:exp_end])
            cases.append({"name": name, "history": history, "expected": expected})
        except Exception as e:  # noqa: BLE001
            errors.append((name, repr(e)))

    with open(out_path, "w") as f:
        json.dump({"changesets": changesets, "cases": cases}, f, indent=1)
    print(f"ported {len(cases)} cases, {len(errors)} errors -> {out_path}")
    for name, err in errors:
        print("  ERR", name, err)
    return 0 if not errors else 1


if __name__ == "__main__":
    sys.exit(main())
