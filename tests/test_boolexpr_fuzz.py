"""Fuzz glob_to_regex against an independent model of the reference's
glob semantics (Go ``path.Match``, the matcher the reference's expression
library uses — VERDICT r1 item 9).

The model below is written from the documented contract
(pkg.go.dev/path#Match): term-by-term backtracking match where ``*`` and
``?`` never cross ``/``, classes support caret negation / escapes /
ranges, and malformed patterns are ErrBadPattern.  It shares no code with
glob_to_regex, so agreement is evidence, not tautology.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dudb_spark.functions.boolexpr import BadGlob, glob_to_regex


class BadPattern(Exception):
    pass


def _scan_member(pat: str, j: int) -> tuple[str, int]:
    """One class-range endpoint (the spec's character-range production):
    bare '-' / ']' are malformed, '\\x' yields x."""
    if j >= len(pat) or pat[j] in "-]":
        raise BadPattern(pat)
    if pat[j] == "\\":
        j += 1
        if j >= len(pat):
            raise BadPattern(pat)
    return pat[j], j + 1


def go_match(pat: str, name: str) -> bool:
    """Model of Go path.Match(pat, name).  The whole pattern is validated
    up front: post-1.16 Go diagnoses ErrBadPattern wherever the mismatch
    happens, and a successful match consumes every chunk anyway, so
    upfront validation is observationally identical."""

    def _class_match(p: int, ch: str) -> tuple[bool, int]:
        j = p + 1
        negated = j < len(pat) and pat[j] == "^"
        if negated:
            j += 1
        hit = False
        members = 0
        while True:
            if j < len(pat) and pat[j] == "]" and members:
                j += 1
                break
            lo, j = _scan_member(pat, j)
            hi = lo
            if j < len(pat) and pat[j] == "-":
                hi, j = _scan_member(pat, j + 1)
                if hi < lo:
                    raise BadPattern(pat)
            if lo <= ch <= hi:
                hit = True
            members += 1
        return (hit != negated, j)

    p = 0
    while p < len(pat):
        c = pat[p]
        if c == "\\":
            if p + 1 >= len(pat):
                raise BadPattern(pat)
            p += 2
        elif c == "[":
            _, p = _class_match(p, "\x00")
        else:
            p += 1

    def match_here(p: int, n: int) -> bool:
        while p < len(pat):
            c = pat[p]
            if c == "*":
                # try every split of the remaining non-separator run,
                # longest first (greediness is irrelevant to the boolean)
                limit = len(name)
                for k in range(n, len(name) + 1):
                    if k < len(name) and name[k] == "/":
                        limit = k
                        break
                for stop in range(limit, n - 1, -1):
                    if match_here(p + 1, stop):
                        return True
                return False
            if n >= len(name):
                return False
            if c == "?":
                if name[n] == "/":
                    return False
                p, n = p + 1, n + 1
            elif c == "[":
                matched, p2 = _class_match(p, name[n])
                if not matched:
                    return False
                p, n = p2, n + 1
            elif c == "\\":
                if name[n] != pat[p + 1]:
                    return False
                p, n = p + 2, n + 1
            else:
                if name[n] != c:
                    return False
                p, n = p + 1, n + 1
        return n == len(name)

    return match_here(0, 0)


PATTERN_ALPHABET = list("ab/.*?[]^!-\\z")
NAME_ALPHABET = list("ab/.^!-z")


@settings(max_examples=2000, deadline=None)
@given(
    st.text(alphabet=PATTERN_ALPHABET, max_size=8),
    st.text(alphabet=NAME_ALPHABET, max_size=8),
)
def test_glob_matches_go_model(pat, name):
    try:
        expected = go_match(pat, name)
    except BadPattern:
        with pytest.raises(BadGlob):
            glob_to_regex(pat)
        return
    rx = glob_to_regex(pat)
    assert bool(re.search(rx, name)) == expected, (pat, name, rx)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=PATTERN_ALPHABET, max_size=8))
def test_glob_regex_always_compiles(pat):
    """Whatever survives compile must be a valid regex (the Spark side
    would otherwise throw mid-query, per-row)."""
    try:
        rx = glob_to_regex(pat)
    except BadGlob:
        return
    re.compile(rx)


def test_model_spot_checks():
    """Documented path.Match examples + the class corner cases."""
    assert go_match("abc", "abc")
    assert go_match("*", "abc")
    assert not go_match("*", "a/b")
    assert go_match("a*/b", "abc/b")
    assert not go_match("a*/b", "a/c/b")
    assert go_match("[a-c]", "b")
    assert not go_match("[^a-c]", "b")
    assert go_match("[^a-c]", "d")
    assert go_match("[^a-c]", "/")  # classes may match the separator
    assert go_match("\\*", "*")
    for bad in ("[", "[]", "[^]", "[]a]", "[a-]", "[-a]", "[z-a]", "a\\"):
        with pytest.raises(BadPattern):
            go_match(bad, "zzz")
