"""Property tests for the wikipedia parser (hypothesis): synthesize →
parse round-trips for arbitrary flag/byte/title combinations, matching
the reference regex semantics (WikipediaParser.java:46-80)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

# the same pattern the Spark column expression uses
from samza_hello_samza_spark.functions.wikipedia import WIKI_EDIT_REGEX


def build_line(title, flags, url, user, byte_diff, summary):
    sign = "+" if byte_diff >= 0 else ""
    return f"[[{title}]] {flags} {url} * {user} * ({sign}{byte_diff}) {summary}"


titles = st.text(
    alphabet=st.characters(blacklist_characters="]\n", blacklist_categories=("Cs",)),
    min_size=0,
    max_size=30,
)
flags = st.text(alphabet="MNB!-", min_size=1, max_size=4)
words = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x024F
    ),
    min_size=1,
    max_size=12,
)
summaries = st.text(
    alphabet=st.characters(blacklist_characters="\n", blacklist_categories=("Cs",)),
    min_size=0,
    max_size=40,
)


@settings(max_examples=300, deadline=None)
@given(
    title=titles,
    flag=flags,
    url=words,
    user=words,
    byte_diff=st.integers(min_value=-10**9, max_value=10**9),
    summary=summaries,
)
def test_regex_roundtrip(title, flag, url, user, byte_diff, summary):
    line = build_line(title, flag, f"https://d/{url}", f"user_{user}", byte_diff, summary)
    m = re.fullmatch(WIKI_EDIT_REGEX, line)
    assert m, f"regex failed on {line!r}"
    assert m.group(1) == title
    assert m.group(2) == flag
    assert m.group(4) == f"user_{user}"
    assert int(m.group(5)) == byte_diff
    assert m.group(6) == summary
    # reference flag derivation (WikipediaParser.java:60-66)
    assert ("M" in flag) == ("M" in m.group(2))
    assert title.startswith("Special:") == m.group(1).startswith("Special:")
