"""The PSL table generator (tools/gen_psl.py) and the psl_data seam.

The sandbox carries no copy of the upstream public_suffix_list.dat,
so the generator's parser is pinned against a synthetic excerpt that
exercises every rule form (explicit / wildcard / exception / unicode),
and the upstream-vector check runs only where a generated psl_data
module exists (the tests/test_iceberg_seam.py pattern: the seam is
tested, the environment-gated leg skips with a reason).
"""

import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

from gen_psl import parse_icann_rules  # noqa: E402

SYNTHETIC_DAT = """\
// This is a comment
// ===BEGIN ICANN DOMAINS===
// ac : https://en.wikipedia.org/wiki/.ac
ac
com.ac

// bd : https://en.wikipedia.org/wiki/.bd
*.bd

// ck : https://en.wikipedia.org/wiki/.ck
*.ck
!www.ck

// an IDN entry (punycode form must be emitted too)
рф

// ===END ICANN DOMAINS===
// ===BEGIN PRIVATE DOMAINS===
should-not-appear.example
// ===END PRIVATE DOMAINS===
"""


def test_parser_covers_every_rule_form():
    explicit, wildcards, exceptions = parse_icann_rules(SYNTHETIC_DAT)
    assert {"ac", "com.ac"} <= explicit
    assert "рф" in explicit and "xn--p1ai" in explicit
    assert wildcards == {"bd", "ck"}
    assert exceptions == {"www.ck"}
    # the private section never leaks into the ICANN tables
    assert "should-not-appear.example" not in explicit


def test_parser_rejects_non_psl_input():
    with pytest.raises(ValueError):
        parse_icann_rules("no markers here\n")


def test_lookup_uses_generated_tables_when_present():
    """With psl_data generated, the resolver must index the FULL ICANN
    section; offline, the embedded subset applies and this leg skips."""
    try:
        from courlan_spark.urlkit import psl_data
    except ImportError:
        pytest.skip(
            "psl_data not generated (no public_suffix_list.dat in this "
            "environment) — run tools/gen_psl.py to enable"
        )
    from courlan_spark.urlkit.psl import PUBLIC_SUFFIXES, registrable_domain

    assert PUBLIC_SUFFIXES is psl_data.PUBLIC_SUFFIXES
    assert len(PUBLIC_SUFFIXES) > 4000  # full ICANN section size
    # canonical publicsuffix.org test vectors (ICANN-relevant subset)
    vectors = [
        ("http://example.com/x", "example.com"),
        ("http://a.b.example.com/x", "example.com"),
        ("http://example.co.uk/", "example.co.uk"),
        ("http://b.example.co.uk/", "example.co.uk"),
        ("http://example.ck/", None),  # *.ck wildcard: bare child is a suffix
        ("http://www.ck/", "www.ck"),  # !www.ck exception
        ("http://a.b.example.ck/", "b.example.ck"),
        ("http://city.kobe.jp/", "city.kobe.jp"),
        ("http://example.city.kobe.jp/", "city.kobe.jp"),
    ]
    for url, expected in vectors:
        got = registrable_domain(url)
        fld = got[1] if got else None
        assert fld == expected, f"{url}: {fld} != {expected}"
