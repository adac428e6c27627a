"""F7 literal chunking (split -> per-chunk parse -> merge) and F4 kilometer
parse, against hand-built fixtures (reference: Parser.cs:43-70, 272-276;
RegexPatterns.cs:26)."""

from __future__ import annotations

from pyspark.sql import functions as F

from addressparser_spark.operators.text_analysis import (
    chunk_split,
    chunked_extract,
    kilometer_parse,
)

DOC_SCHEMA = "doc_id bigint, text string"


def test_chunk_split_covers_text_exactly(spark):
    docs = spark.createDataFrame(
        [(1, "x" * 150), (2, "y" * 151), (3, "z" * 449), (4, "short"), (5, "")],
        DOC_SCHEMA,
    )
    chunks = chunk_split(docs, size=150).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(chunks, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r["chunk"])
    # exact cover: concatenating chunks reproduces the text, every chunk <= 150
    assert "".join(by_doc[1]) == "x" * 150 and len(by_doc[1]) == 1
    assert "".join(by_doc[2]) == "y" * 151 and len(by_doc[2]) == 2
    assert [len(c) for c in by_doc[3]] == [150, 150, 149]
    assert by_doc[4] == ["short"]
    assert by_doc[5] == [""]  # empty doc still yields its one (empty) chunk


def test_chunked_extract_picks_main_chunk(spark):
    # doc 1: second chunk is the word-dense one -> merge must pick idx 1
    wordy = "alpha beta gamma delta epsilon zeta " * 5  # 180 chars, many words
    sparse = "#" * 140 + " 77"
    docs = spark.createDataFrame([(1, sparse + wordy), (2, "tiny doc 42")], DOC_SCHEMA)
    rows = {r["doc_id"]: r for r in chunked_extract(docs, size=150).collect()}
    assert rows[1]["main_chunk"] > 0
    assert rows[1]["chunk_words"] > 10
    # single-chunk doc: its own trailing number survives the merge
    assert rows[2]["main_chunk"] == 0 and rows[2]["tail_num"] == 42
    # one row per doc (the merge is an argmax, not a flatten)
    assert chunked_extract(docs, size=150).count() == 2


def test_kilometer_parse(spark):
    docs = spark.createDataFrame(
        [
            (1, "depot at 23 km marker"),
            (2, "склад 108км от города"),  # Cyrillic unit, no space
            (3, "no kilometers here"),
            (4, "KM 12 is not a match"),  # unit before number: no capture
        ],
        DOC_SCHEMA,
    )
    rows = {r["doc_id"]: r for r in kilometer_parse(docs).collect()}
    assert rows[1]["km_n"] == 23
    assert "23 km" in rows[1]["text_rewritten"]
    assert rows[2]["km_n"] == 108
    assert "108 km" in rows[2]["text_rewritten"]  # unit normalized to 'km'
    assert rows[3]["km_n"] is None
    assert rows[3]["text_rewritten"] == "no kilometers here"
    assert rows[4]["km_n"] is None


def test_text_repetition_flags_boilerplate(spark):
    from addressparser_spark.operators.text_analysis import text_repetition

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam spam eggs"),  # one token dominates
            (2, "buy now buy now buy now buy now buy now buy now"),    # duplicated bigrams
            (3, "a perfectly ordinary sentence with no repeated tokens whatsoever"),
            (4, ""),                                                    # empty -> all zeros
            (5, "single"),                                              # n=1 -> no bigrams
        ],
        DOC_SCHEMA,
    )
    rows = {r["doc_id"]: r for r in text_repetition(docs).collect()}
    assert rows[1]["top_token_frac"] == 0.9 and rows[1]["flagged"]
    assert rows[2]["dup_bigram_frac"] > 0.5 and rows[2]["flagged"]
    assert rows[3]["distinct_token_ratio"] == 1.0 and not rows[3]["flagged"]
    assert (rows[4]["n_tokens"], rows[4]["dup_bigram_frac"], bool(rows[4]["flagged"])) == (0, 0.0, False)
    # a one-token doc is 100% its top token: degenerate docs flag by design
    assert rows[5]["dup_bigram_frac"] == 0.0 and rows[5]["top_token_frac"] == 1.0
    assert rows[5]["flagged"]


def test_text_scrub_masks_pii_and_counts(spark):
    from addressparser_spark.operators.text_analysis import text_scrub

    docs = spark.createDataFrame(
        [
            (1, "mail alice@example.com or bob.smith+x@sub.domain.org today"),
            (2, "see https://example.com/a?b=1 and http://x.io/p for details"),
            (3, "call 79991234567 ref 12345678 (but 123456 is too short)"),
            (4, "https://u:p@host.com/path has an email-shaped substring"),
            (5, "plain text stays untouched"),
        ],
        DOC_SCHEMA,
    )
    rows = {r["doc_id"]: r for r in text_scrub(docs).collect()}
    assert rows[1]["n_emails"] == 2
    assert rows[1]["text_scrubbed"] == "mail <email> or <email> today"
    assert rows[2]["n_urls"] == 2
    assert rows[2]["text_scrubbed"] == "see <url> and <url> for details"
    assert rows[3]["n_numbers"] == 2
    assert rows[3]["text_scrubbed"] == "call <number> ref <number> (but 123456 is too short)"
    # URL masks FIRST, so its embedded email-shaped substring never leaks a
    # partial <email> replacement into the middle of a masked URL
    assert rows[4]["text_scrubbed"] == "<url> has an email-shaped substring"
    assert rows[5]["text_scrubbed"] == "plain text stays untouched"
    assert (rows[5]["n_emails"], rows[5]["n_urls"], rows[5]["n_numbers"]) == (0, 0, 0)


def test_gopher_rules_fixtures(spark):
    """One fixture per Gopher rule in text_quality (symbol ratio,
    mean-word-length band both directions, minimum stop-word evidence),
    plus a clean doc asserting no rule fires spuriously."""
    from addressparser_spark.operators.text_analysis import text_quality

    docs = spark.createDataFrame(
        [
            # clean: stopword-bearing English, mean token len inside [3,10]
            (1, "the quick brown fox jumps and runs to the lazy dog barn"),
            # symbol-heavy: 6 '#' + 2 '...' over 6 tokens -> ratio >> 0.1
            (2, "the code is ### broken ### see ... more ..."),
            # no stop-word evidence (< 2 hits)
            (3, "quantum flux capacitor module recalibration"),
            # mean token length above the band (avg > 10)
            (4, "the supercalifragilisticexpialidocious anthropomorphization incomprehensibilities the"),
            # mean token length below the band (avg < 3)
            (5, "a b c d to e f g h i j k l m n"),
        ],
        DOC_SCHEMA,
    )
    rows = {r["doc_id"]: r for r in text_quality(docs).collect()}
    assert not rows[1]["gopher_flagged"]
    assert rows[1]["mean_word_len_ok"] and rows[1]["stopword_hits"] >= 2
    assert rows[1]["symbol_word_ratio"] == 0.0

    assert rows[2]["gopher_flagged"] and rows[2]["symbol_word_ratio"] > 0.1
    # '###' counts as three '#' marks, each '...' as one ellipsis
    assert round(rows[2]["symbol_word_ratio"] * 6) == 8
    assert rows[2]["mean_word_len_ok"] and rows[2]["stopword_hits"] >= 2

    assert rows[3]["gopher_flagged"] and rows[3]["stopword_hits"] < 2
    assert rows[3]["mean_word_len_ok"] and rows[3]["symbol_word_ratio"] == 0.0

    assert rows[4]["gopher_flagged"] and not rows[4]["mean_word_len_ok"]
    assert rows[4]["avg_token_len"] > 10 and rows[4]["stopword_hits"] >= 2

    assert rows[5]["gopher_flagged"] and not rows[5]["mean_word_len_ok"]
    assert rows[5]["avg_token_len"] < 3 and rows[5]["stopword_hits"] >= 2
