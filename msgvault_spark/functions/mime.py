"""Raw-MIME functions: zlib decode, header normalization, encoding repair,
RFC822 id extraction, embedding preprocessing.

Reference parity:
  F14 zlib decompression of stored raw MIME (query/shared.go:195-207,
      dedup.go:554-575)
  F15 MIME normalization for content-hash dedup — split header/body, drop
      transport headers, unfold + sort the rest, canonical separator
      (dedup.go:673-753)
  F16 encoding repair — transcode to UTF-8 with fallback, strip control
      chars, rune-truncate (internal/textutil/encoding.go)
  F17 embedding preprocessing — strip reply-quotes and signatures, prepend
      subject, truncate (vector/embed/preprocess.go:15-79)
  D6  RFC822 Message-ID backfill from raw headers (dedup.go:278-300)

Imperative byte-level parsing (zlib, folding-aware header walks, charset
sniffing) lives in Arrow-batched pandas UDFs — the sanctioned slow path
(SURVEY.md §2.12); everything regular-expression-shaped stays native.
"""

from __future__ import annotations

import re
import zlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# transport/trace headers excluded from the dedup content hash — they vary
# between copies of the same logical message (dedup.go:681-706)
TRANSPORT_HEADERS = frozenset(
    h.lower()
    for h in (
        "received",
        "received-spf",
        "return-path",
        "delivered-to",
        "x-received",
        "x-google-smtp-source",
        "x-gm-message-state",
        "x-gmail-labels",
        "x-gmail-msgid",
        "x-gmail-thrid",
        "arc-seal",
        "arc-message-signature",
        "arc-authentication-results",
        "dkim-signature",
        "domainkey-signature",
        "authentication-results",
        "x-spam-status",
        "x-spam-checker-version",
    )
)


@pandas_udf(T.BinaryType())
def zlib_decompress(raw: pd.Series) -> pd.Series:
    """F14: zlib-decompress a BinaryType column; passes through values that
    are not zlib streams (the reference stores both raw and compressed)."""

    def _one(b):
        if b is None:
            return None
        try:
            return zlib.decompress(bytes(b))
        except zlib.error:
            return bytes(b)

    return raw.map(_one)


@pandas_udf(T.BinaryType())
def zlib_compress(raw: pd.Series) -> pd.Series:
    """Store-side twin of ``zlib_decompress`` (the reference writes raw
    MIME zlib-compressed, store side of shared.go:217-252); used by the
    synthetic raw store and ETL sinks."""

    def _one(b):
        if b is None:
            return None
        return zlib.compress(bytes(b))

    return raw.map(_one)


def _normalize_one(text: str | None) -> str | None:
    if text is None:
        return None
    # split headers from body at the first blank line
    m = re.search(r"\r?\n\r?\n", text)
    if m:
        head, body = text[: m.start()], text[m.end():]
    else:
        head, body = text, ""
    # unfold: continuation lines start with whitespace
    lines: list[str] = []
    for raw_line in head.splitlines():
        if raw_line[:1] in (" ", "\t") and lines:
            lines[-1] += " " + raw_line.strip()
        else:
            lines.append(raw_line)
    kept = []
    for line in lines:
        name = line.split(":", 1)[0].strip().lower()
        if name and name not in TRANSPORT_HEADERS:
            kept.append(re.sub(r"\s+", " ", line.strip()))
    kept.sort()
    return "\n".join(kept) + "\n\n" + body.strip()


@pandas_udf(T.StringType())
def normalize_mime(raw: pd.Series) -> pd.Series:
    """F15: canonical form whose SHA-256 identifies logical duplicates
    across mailboxes regardless of transport trace headers."""
    return raw.map(_normalize_one)


def mime_content_hash(col: Column) -> Column:
    """D2: content-addressable hash of the normalized message."""
    return F.sha2(normalize_mime(col), 256)


def rfc822_message_id(col: Column) -> Column:
    """D6: extract the Message-ID header value (angle-bracket form) from raw
    headers — native regexp, no UDF."""
    return F.nullif(
        F.regexp_extract(col, r"(?im)^message-id:\s*<([^>]+)>", 1), F.lit("")
    )


@pandas_udf(T.StringType())
def repair_encoding(raw: pd.Series) -> pd.Series:
    """F16: bytes → clean UTF-8 text. UTF-8 strict, then latin-1 fallback
    (the reference sniffs charsets; latin-1 is its final fallback too), then
    control-character sanitize."""

    def _one(b):
        if b is None:
            return None
        data = bytes(b)
        try:
            s = data.decode("utf-8")
        except UnicodeDecodeError:
            s = data.decode("latin-1", errors="replace")
        return re.sub(r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "", s)

    return raw.map(_one)


_QUOTE_LINE = r"(?m)^>.*$"
_ON_WROTE = r"(?m)^On .{0,200} wrote:\s*$"
_SIGNATURE = r"(?ms)^-- $.*"


def preprocess_for_embedding(
    body: Column, subject: Column, max_chars: int = 2000
) -> Column:
    """F17: the reference's embed-text shaping as a native regexp chain —
    drop quoted reply lines and 'On … wrote:' attributions, cut '-- '
    signatures, prepend 'Subject: …', whitespace-collapse, truncate."""
    cleaned = F.regexp_replace(body, _QUOTE_LINE, "")
    cleaned = F.regexp_replace(cleaned, _ON_WROTE, "")
    cleaned = F.regexp_replace(cleaned, _SIGNATURE, "")
    cleaned = F.trim(F.regexp_replace(cleaned, r"\s+", " "))
    with_subject = F.concat(
        F.lit("Subject: "), F.coalesce(subject, F.lit("")), F.lit("\n"), cleaned
    )
    return F.substring(with_subject, 1, max_chars)


def extract_inline_part(raw_text: str, cid: str) -> tuple[str, bytes] | None:
    """Find the CID-referenced inline MIME part in a raw RFC822 message
    (reference handleMessageInline, api/handlers.go:1625-1688: an inline
    part matches on ContentID and IsInline). Returns (content_type,
    decoded bytes) or None. Driver-side helper over ONE already-fetched
    raw message — the data-plane fetch is the batched get_messages_raw;
    this is the serving edge's last hop, like the reference's mime.Parse
    on a single row."""
    import email
    from email import policy

    msg = email.message_from_string(raw_text, policy=policy.default)
    for part in msg.walk():
        if part.is_multipart():
            continue
        pcid = (part.get("Content-ID") or "").strip().strip("<>")
        if not pcid or pcid != cid:
            continue
        disp = part.get_content_disposition()
        # reference IsInline: an explicit inline disposition, or a
        # CID-addressed part that is not declared as an attachment
        if disp not in (None, "inline"):
            continue
        payload = part.get_payload(decode=True)
        if payload is None:
            payload = (part.get_payload() or "").encode()
        return part.get_content_type(), payload
    return None
