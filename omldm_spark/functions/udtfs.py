"""Python UDTF surface (SURVEY.md §2.10).

The reference's flatMap-style rich functions (P1-P5,
DataInstanceParser.scala etc.) are one-row-in / many-rows-out operators.
The engine-native Spark equivalents used throughout this repo are
Catalyst ``explode``/``inline`` (JVM-side, codegen — always the first
choice).  This module covers the remaining extension point: a USER-
authored one-to-many operator in Python, via Spark 4's ``@udtf`` —
registered once, callable from SQL as a LATERAL table function, so a
SQL-only user can plug custom row-expanding logic without touching the
DataFrame API.

Performance boundary (why the built-ins still win): a Python UDTF is a
row-at-a-time Python loop behind Arrow transport — fine for control-
plane-sized inputs or genuinely un-expressible logic, wrong for the
100 TB hot path, where ``doc_chunks``'s pure-Catalyst explode does the
same expansion inside whole-stage codegen."""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, n_words int, chunk string")
class ChunkWordsUDTF:
    """Word-window chunker: emit successive ``size``-word windows of the
    input text — the UDTF twin of the corpus chunker, used to pin the
    UDTF contract (ordering, empty input, trailing partial window)."""

    def eval(self, text: str, size: int):  # noqa: D102
        if not text or size <= 0:
            return
        words = text.split()
        for i in range(0, len(words), size):
            yield i // size, len(words[i:i + size]), " ".join(
                words[i:i + size]
            )


def register_udtfs(spark) -> None:
    """Make the UDTFs callable from SQL (LATERAL chunk_words(...))."""
    spark.udtf.register("chunk_words", ChunkWordsUDTF)
