"""Regex required-literal analysis (analysis/regexq.py): hand battery +
randomized soundness — for every extracted literal L and every string the
pattern matches, L must occur in the lowercased string (this is what makes
trigram candidates a superset of matches, hence verified results exact)."""

from __future__ import annotations

import random
import re

from docix_spark.analysis.regexq import required_literals


def test_literal_extraction_battery():
    cases = {
        "windo[a-z]?": ["windo"],
        "win[a-z]+ s[a-z]rt": ["win", " s", "rt"],
        "ab*c": ["a", "c"],
        "ab+c": ["ab", "c"],
        "ab{2,3}c": ["ab", "c"],
        "ab{0,3}c": ["a", "c"],
        r"a\.b": ["a.b"],
        r"a\d+b": ["a", "b"],
        "^foo bar$": ["foo bar"],
        "foo(bar)?": [],  # group → bail
        "foo|bar": [],  # alternation → bail
        r"a\1": [],  # backreference → bail
        "Win[A-Z]ow": ["win", "ow"],  # literals lowercased for the index
        r"x\bword": ["x", "word"],  # zero-width anchor breaks adjacency
        r"snake_case\d{2}": ["snake_case"],
    }
    for pattern, want in cases.items():
        assert required_literals(pattern) == want, pattern


def test_literal_soundness_fuzz():
    random.seed(7)
    atoms = ["a", "b", "c", "x", " ", "[abc]", ".", r"\d"]
    quants = ["", "*", "+", "?", "{0,2}", "{1,2}", "{2}"]
    checked_matches = 0
    for _ in range(1500):
        pat = "".join(
            random.choice(atoms) + random.choice(quants)
            for _ in range(random.randint(1, 6))
        )
        try:
            rx = re.compile(pat)
        except re.error:
            continue
        lits = required_literals(pat)
        for _ in range(30):
            s = "".join(
                random.choice("abcx 0123") for _ in range(random.randint(0, 12))
            )
            if rx.search(s):
                checked_matches += 1
                for lit in lits:
                    assert lit in s.lower(), (pat, s, lit)
    assert checked_matches > 1000  # the fuzz actually exercised matches
