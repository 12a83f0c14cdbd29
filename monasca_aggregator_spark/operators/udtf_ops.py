"""Python UDTFs (Spark 4 user-defined TABLE functions).

A UDTF is the missing set-returning-function surface of the SQL
engine: registered once, it joins like a relation — ``SELECT ...
FROM docs, LATERAL split_sentences(doc_id, text)`` — so downstream
consumers (Thrift server, Spark Connect, notebooks) get row-expanding
operators with no Python on THEIR side. This module ships the RAG
ingestion exploder as the reference instance.

Semantics contract: ``split_sentences`` reproduces EXACTLY the
JVM-side sentence unit split used by ``plans/pipeline_ops.
q_chunk_sentences`` (split on '.', trim, drop empties) — pinned in
tests/test_udtf.py by comparing the UDTF's lateral-join output
against the posexplode formulation row for row. The hot path for
corpus-scale chunking remains the pure-JVM posexplode plan (a UDTF
runs Python per input row — the analyze/eval protocol is the price of
the SQL-surface ergonomics); the UDTF is the interoperability
surface, not the bulk operator, and the docstring of each consumer
says which to use.

Spark 4 notes: ``useArrow=True`` requests the Arrow-batched transport
(``spark.sql.execution.pythonUDTF.arrow.enabled`` equivalent per
function); yields must match the declared ``returnType`` order.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


class _SentenceSplit:
    """Yield (idx, sentence) units of one document — '.'-delimited,
    trimmed, empties dropped (the q_chunk_sentences unit contract)."""

    def eval(self, doc_id, text):  # noqa: ANN001 - UDTF protocol
        if text is None:
            return
        idx = 0
        for raw in str(text).split("."):
            # strip ASCII space ONLY: the JVM twin uses F.trim, which
            # removes just ' ' — bare str.strip() removes all Unicode
            # whitespace (\t, \n, NBSP) and breaks the pinned
            # row-for-row equivalence on tab/newline-adjacent units
            unit = raw.strip(" ")
            if unit:
                yield doc_id, idx, unit
                idx += 1


# Arrow-batched where the runtime supports it; falls back to pickle
# transport transparently on older configs.
sentence_split_udtf = udtf(
    _SentenceSplit,
    returnType="doc_id bigint, unit_idx int, unit string",
    useArrow=True,
)


def register_udtfs(spark) -> None:
    """Register every shipped UDTF on the session catalog (idempotent)
    so plain-SQL clients can LATERAL-join them."""
    spark.udtf.register("split_sentences", sentence_split_udtf)
