"""Text-cleaning / redaction operators for training-data pipelines.

Sensitive-token redaction is a standard pre-training scrub step; for
this engine's cybersecurity transcripts the analogue is masking
indicator-of-compromise tokens (CVE identifiers, version numbers —
plus email/IPv4 seats for generic corpora). All patterns run through
``pyarrow.compute``'s RE2 regex kernels, the SAME regex engine DuckDB
uses, so the oracle agrees byte-for-byte with no Python-re semantic
drift. Zero shuffle: a single streaming ``map_batches`` pass.

Replacement tokens contain no digits or '@', so later patterns can
never match inside earlier replacements — pattern application order
still mirrors the SQL's nested ``regexp_replace`` exactly.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement) applied in order; all patterns are
# RE2- and DuckDB-compatible (no backrefs, no lookaround)
REDACT_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("cve", r"CVE-[0-9]{4}-[0-9]+", "<CVE>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
     "<IP>"),
    ("version", r"[0-9]+\.[0-9]+(\.[0-9]+)?", "<VER>"),
)


def redact_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized sequential redaction of one Arrow batch: counts each
    pattern's matches on the text as it stood when that pattern ran
    (the nested-replace semantics), then replaces."""
    text = batch.column(text_col)
    total = None
    for _, pat, repl in REDACT_PATTERNS:
        n = pc.count_substring_regex(text, pat).cast(pa.int64())
        total = n if total is None else pc.add(total, n)
        text = pc.replace_substring_regex(text, pat, repl)
    cols = {name: batch.column(name) for name in batch.column_names
            if name != text_col}
    cols["clean_text"] = text
    cols["n_redactions"] = total
    return pa.table(cols)


def redact_sql_expr(text_expr: str) -> tuple[str, str]:
    """(clean_text_sql, n_redactions_sql) mirroring :func:`redact_batch`
    as nested DuckDB regexp_replace / regexp_extract_all — the oracle
    twin, built from the same REDACT_PATTERNS table."""
    clean = text_expr
    counts = []
    for _, pat, repl in REDACT_PATTERNS:
        p = pat.replace("'", "''")
        counts.append(
            f"len(regexp_extract_all({clean}, '{p}'))")
        clean = f"regexp_replace({clean}, '{p}', '{repl}', 'g')"
    return clean, " + ".join(counts)


def redact_transcripts(corpus_dir: str):
    """Redaction pass over the transcript corpus: (conv_id, turn_idx,
    clean_text, n_redactions)."""
    import ray.data
    ds = ray.data.read_parquet(f"{corpus_dir}/transcripts",
                               columns=["conv_id", "turn_idx", "text"])
    return ds.map_batches(redact_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Document normalization: the standard pre-tokenization scrub
# (lowercase + whitespace-run collapse). Same zero-shuffle RE2 shape
# as redaction; integer change counter for exact oracle compare.
# ---------------------------------------------------------------------------

NORMALIZE_SQL = """
    SELECT doc_id,
           lower(regexp_replace(text, '  +', ' ', 'g')) AS clean_text,
           CAST(length(text) -
                length(regexp_replace(text, '  +', ' ', 'g'))
                AS BIGINT) AS n_collapsed
    FROM documents
"""


def normalize_batch(batch: pa.Table) -> pa.Table:
    text = batch.column("text")
    collapsed = pc.replace_substring_regex(text, "  +", " ")
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "clean_text": pc.utf8_lower(collapsed),
        "n_collapsed": pc.subtract(
            pc.utf8_length(text),
            pc.utf8_length(collapsed)).cast(pa.int64()),
    })


def normalize_documents(sf_dir: str):
    """(doc_id, clean_text, n_collapsed): lowercased text with
    whitespace runs collapsed — one streaming RE2 pass, no shuffle."""
    import ray.data
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"]) \
        .map_batches(normalize_batch, batch_format="pyarrow",
                     batch_size=None)
