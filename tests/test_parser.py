"""Table-driven parser tests (model: reference search/parser_test.go)."""

from datetime import datetime

from msgvault_spark.search.parser import (
    normalize_addr,
    parse_query,
    parse_size,
    tokenize,
)


def test_bare_terms():
    q = parse_query("hello world")
    assert q.text_terms == ["hello", "world"]
    assert q.is_empty() is False
    assert q.has_operators() is False


def test_quoted_phrase():
    q = parse_query('"hello world" extra')
    assert q.text_terms == ["hello world", "extra"]


def test_operators():
    q = parse_query(
        "from:a@x.com to:b@y.com cc:c@z.com bcc:d@w.com subject:plan "
        "label:INBOX l:Work has:attachment larger:5M smaller:100K"
    )
    assert q.from_addrs == ["a@x.com"]
    assert q.to_addrs == ["b@y.com"]
    assert q.cc_addrs == ["c@z.com"]
    assert q.bcc_addrs == ["d@w.com"]
    assert q.subject_terms == ["plan"]
    assert q.labels == ["INBOX", "Work"]
    assert q.has_attachment is True
    assert q.larger_than == 5 * 1024 * 1024
    assert q.smaller_than == 100 * 1024


def test_op_quoted_value():
    q = parse_query('subject:"foo bar" from:"Some One"')
    assert q.subject_terms == ["foo bar"]
    assert q.from_addrs == ["some one"]


def test_bare_domain_prefixing():
    assert normalize_addr("example.com") == "@example.com"
    assert normalize_addr("john.doe") == "john.doe"  # not a known TLD
    assert normalize_addr("EXAMPLE.ORG") == "@example.org"
    assert normalize_addr("a@b.com") == "a@b.com"
    assert normalize_addr("site.de") == "@site.de"  # 2-letter ccTLD
    assert normalize_addr("brand.pizza") == "brand.pizza"  # unlisted gTLD


def test_dates_absolute():
    q = parse_query("after:2024-01-15 before:2024/02/20")
    assert q.after_date == datetime(2024, 1, 15)
    assert q.before_date == datetime(2024, 2, 20)


def test_dates_relative():
    now = datetime(2024, 3, 31)
    q = parse_query("older_than:7d newer_than:2w", now=now)
    assert q.before_date == datetime(2024, 3, 24)
    assert q.after_date == datetime(2024, 3, 17)
    # calendar-aware month arithmetic (Go AddDate normalization)
    q2 = parse_query("older_than:1m", now=now)
    assert q2.before_date == datetime(2024, 3, 2)  # Feb 31 → Mar 2


def test_sizes():
    assert parse_size("5M") == 5 * 1024 * 1024
    assert parse_size("100K") == 100 * 1024
    assert parse_size("1G") == 1024**3
    assert parse_size("2.5K") == int(2.5 * 1024)
    assert parse_size("12345") == 12345
    assert parse_size("nope") is None


def test_unknown_operator_is_text():
    q = parse_query("foo:bar baz")
    assert q.text_terms == ["foo:bar", "baz"]


def test_unterminated_quote_not_dropped():
    q = parse_query('"unterminated phrase')
    assert q.text_terms == ["unterminated phrase"]


def test_tokenize_op_quoted():
    assert tokenize('subject:"a b" c') == ['subject:"a b"', "c"]
    assert tokenize('"a b" subject:c') == ['"a b"', "subject:c"]


def test_parser_total_on_arbitrary_printable_input():
    """The Gmail-style parser must be TOTAL: no printable query string may
    raise, and the parse is idempotent on its own text-term rendering —
    the property a user-facing search box needs (reference parser.go
    tolerates arbitrary input). Hypothesis sweeps operator soup, stray
    quotes/colons, unicode, and size/date garbage."""
    from hypothesis import given, settings, strategies as st

    from msgvault_spark.search.parser import parse_query

    ops = st.sampled_from([
        "from:", "to:", "cc:", "bcc:", "subject:", "label:", "has:",
        "larger:", "smaller:", "before:", "after:", "account:", '"', ":",
    ])
    word = st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        min_size=0, max_size=8,
    )
    piece = st.one_of(word, st.tuples(ops, word).map(lambda t: t[0] + t[1]))
    query = st.lists(piece, min_size=0, max_size=6).map(" ".join)

    @given(q=query)
    @settings(max_examples=300, deadline=None, derandomize=True)
    def run(q):
        parsed = parse_query(q)
        # every collected field is well-typed
        for lst in (parsed.from_addrs, parsed.to_addrs, parsed.cc_addrs,
                    parsed.bcc_addrs, parsed.text_terms, parsed.subject_terms,
                    parsed.labels):
            assert all(isinstance(x, str) for x in lst)
        # parsing is stable: re-parsing a bare text term keeps it a term
        for term in parsed.text_terms:
            if term and ":" not in term and '"' not in term and " " not in term:
                again = parse_query(term)
                assert term in again.text_terms

    run()
