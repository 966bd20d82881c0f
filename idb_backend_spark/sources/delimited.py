"""S2/S3 — delimited (CSV/TSV) source with term canonicalization and
per-row fault isolation (reference idigbio_ingestion/lib/delimited.py).

Spark-first formulation: ``spark.read.csv`` in PERMISSIVE mode does the
reference's per-row error recovery (bad lines land in a corrupt-record
column instead of failing the batch — SURVEY §7.7 item 8); header
canonicalization is a driver-side rename through the fieldnames registry;
blank-string fields become nulls to match the reference's
"dict of non-blank fields" contract (delimited.py:49-52).

At scale the read is fully distributed: one task per input split,
predicate/column pruning applies downstream, and the canonicalization is
pure metadata (no data movement) — for local single files it is a
POSITIONAL fold from the raw header line, so several headers claiming
one canonical term collapse to the reference's last-non-empty-wins
value (delimited.py:265-268), duplicate literal headers included.
"""

from __future__ import annotations

import re
from functools import reduce
from operator import or_

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from idb_backend_spark.sources.fieldnames import get_canonical_name

CORRUPT_COL = "__corrupt_record"

#: encodings where one character encodes to one byte that can never occur
#: inside another character's encoding (UTF-8 keeps ASCII bytes < 0x80 out
#: of continuation bytes) — the byte-scan probe is exact for these
_BYTE_TRANSPARENT_ENCODINGS = {
    "utf8", "ascii", "usascii", "latin1", "iso88591", "cp1252", "windows1252",
}


def file_contains_char(path: str, ch: str, encoding: str | None) -> bool:
    """Whether the file contains ``ch`` at all — the splittability probe
    behind the multiLine decision in both delimited and DwC-A reads.
    Conservative: any path we cannot byte-scan exactly (directory/glob,
    non-transparent encoding, multi-byte needle) reports True, which
    only costs parallelism, never correctness."""
    import os

    if not os.path.isfile(path):
        return True
    enc = (encoding or "utf-8").lower().replace("-", "").replace("_", "")
    if enc not in _BYTE_TRANSPARENT_ENCODINGS:
        return True
    try:
        needle = ch.encode(encoding or "utf-8")
    except (UnicodeEncodeError, LookupError):
        return True
    if len(needle) != 1 or needle[0] >= 0x80:
        return True
    with open(path, "rb") as f:
        while chunk := f.read(8 << 20):
            if needle in chunk:
                return True
    return False


def _raw_header(
    path: str, sep: str, quote: str, encoding: str | None
) -> list[str] | None:
    """The file's verbatim header row, parsed with the same csv dialect
    the reference's reader uses (csv.reader, doublequote, no
    escapechar) — or None when the path is not a local single file we
    can read exactly (directory/glob/URI). Only the header LINE is
    read; the driver never scans data rows."""
    import csv
    import os

    if not os.path.isfile(path):
        return None
    try:
        with open(path, "r", encoding=encoding or "utf-8", newline="") as f:
            if quote:
                r = csv.reader(f, delimiter=sep, quotechar=quote)
            else:
                r = csv.reader(f, delimiter=sep, quoting=csv.QUOTE_NONE)
            return next(r, None)
    except (OSError, UnicodeDecodeError, LookupError, csv.Error, TypeError):
        # TypeError: csv.reader rejects a multi-character or otherwise
        # invalid quotechar — fall back to the name-based path instead
        # of crashing the read (ADVICE r14)
        return None


def normalize_delimiter(d: str | None, default: str = ",") -> str:
    """Delimiter normalization (delimited.py:63-125): words (``tab``),
    backslash escapes, ``0x09`` hex, XML entities ``&#9;``/``&#x9;``,
    quoted wrappers, and repeated-identical-char collapse."""
    if d is None:
        return default
    if isinstance(d, (bytes, bytearray)):
        d = bytes(d).decode("utf-8", errors="replace")
    d = str(d)
    if len(d) == 1 and d in ("\t", " "):
        # a literal whitespace char IS the delimiter — don't strip it away
        return d
    if len(d) > 1 and len(set(d)) == 1 and d[0] in ("\t", " "):
        # repeated literal whitespace ('\t\t') collapses like any other
        # repeated delimiter — strip() first would silently turn a
        # doubled-tab TSV declaration into the comma default
        return d[0]
    d = d.strip()
    if len(d) >= 2 and d[0] == d[-1] and d[0] in ("'", '"'):
        d = d[1:-1]
    # NB: r"\t" and "\\t" are the SAME two-character string — one spelling
    if d.lower() == "tab" or d == "\\t":
        d = "\t"
    elif d == "\\n":
        d = "\n"
    elif d == "\\r":
        d = "\r"
    m = re.fullmatch(r"0x([0-9a-fA-F]+)", d)
    if m:
        d = chr(int(m.group(1), 16))
    m = re.fullmatch(r"&#([0-9]+);", d)
    if m:
        d = chr(int(m.group(1), 10))
    m = re.fullmatch(r"&#x([0-9a-fA-F]+);", d)
    if m:
        d = chr(int(m.group(1), 16))
    if d == "":
        return default
    if len(d) != 1 and len(set(d)) == 1:
        d = d[0]
    if len(d) != 1:
        raise ValueError(f"invalid delimiter {d!r} (expected 1 character)")
    return d


def read_delimited(
    spark: SparkSession,
    path: str,
    sep: str | None = ",",
    encoding: str = "utf-8",
    header: bool = True,
    quote: str = '"',
    canonicalize: bool = True,
    blank_as_null: bool = True,
    multiline: bool | None = None,
) -> DataFrame:
    """Read a delimited file into a DataFrame with canonicalized CURIE
    column names and a ``flag_corrupt_row`` marker column.

    PERMISSIVE + columnNameOfCorruptRecord replaces the reference's
    per-row try/except-log-skip loop (delimited.py:256-305): corrupt rows
    survive with the flag set and all fields null — downstream decides.
    Two reference behaviors deliberately NOT reproduced (pinned in
    tests/test_sources_export.py
    ``test_reference_first_row_pins_line_length``): mismatched-length
    rows are silently SKIPPED there (logged, absent from output), and
    the expected length is pinned from the FIRST DATA ROW — not the
    declared field count (delimited.py:244-248) — so a short first row
    makes the reader skip every correct full-length row after it. Here
    the schema comes from the header/meta declaration and bad rows are
    flagged, not dropped.

    ``multiline``: None (default) probes the file for the quote char and
    enables multiLine only when one is present — quoted fields with
    embedded newlines then parse as ONE record (the reference's
    csv.reader behavior) at the cost of a single-task read. The
    trade-off is inherent to quoted CSV: under multiLine an UNCLOSED
    quote swallows the rest of the file into one field (exactly what
    csv.reader does too), so per-row corrupt isolation is strongest on
    line-oriented feeds; pass ``multiline=False`` to force line-split
    parsing (splittable, best isolation, breaks embedded newlines) or
    ``True`` to skip the probe.

    The probe only byte-scans LOCAL single files; directories, globs,
    and object-store URIs conservatively take the multiLine path
    (correct, one task per file). At cluster scale pass ``multiline``
    explicitly — you know whether the feed quotes — instead of paying
    the conservative default or the driver-side scan of a large local
    file.
    """
    reader = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", normalize_delimiter(sep))
        .option("quote", quote)
        # RFC-4180 quote doubling — what write_csv_member emits and the
        # reference's csv.reader parses (doublequote=True, no escapechar);
        # Spark's default backslash escape corrupts any quoted value
        # containing the quote char
        .option("escape", quote)
        .option("encoding", encoding)
        .option("enforceSchema", "false")
    )
    if multiline is None:
        # probe: multiLine only when a quote char is actually present —
        # the common no-quotes case stays a splittable parallel read
        # (same byte-scan bound as the DwC-A member reader)
        multiline = bool(quote) and file_contains_char(path, quote, encoding)
    if multiline:
        reader = reader.option("multiLine", "true")
    raw = _raw_header(path, normalize_delimiter(sep), quote, encoding)
    df = reader.csv(path)
    if CORRUPT_COL not in df.columns:
        # Spark only EMITS columnNameOfCorruptRecord when that column is
        # part of a user-supplied schema — an inferred read silently
        # drops the malformed-row capture and flag_corrupt_row could
        # never fire. The first pass only discovers the header (all
        # columns are strings, nothing is inferred); the second read
        # supplies that schema plus the corrupt column so PERMISSIVE
        # mode actually lands bad rows in it.
        from pyspark.sql.types import StringType, StructField, StructType

        schema = StructType(
            [StructField(f.name, StringType()) for f in df.schema.fields]
            + [StructField(CORRUPT_COL, StringType())]
        )
        # enforceSchema=true on the schema-bearing read of a VERIFIED
        # local single file: the schema IS that file's own header (plus
        # the corrupt column), but Spark's header validation compares
        # literal header tokens against schema names and duplicate
        # headers were DEDUPED positionally by the first pass
        # (genus,genus -> genus0,genus1) — validation would fail the
        # read at runtime on exactly the files the duplicate-canonical
        # fold exists for. Directory/glob reads keep the validation:
        # there a mismatched second file's header SHOULD fail loudly
        # rather than parse positionally.
        if raw is not None:
            reader = reader.option("enforceSchema", "true")
        df = reader.schema(schema).csv(path)
    if canonicalize and header:
        data_cols = [c for c in df.columns if c != CORRUPT_COL]
        if raw is not None and len(raw) == len(data_cols):
            # Positional canonicalization from the RAW header — the
            # reference's exact shape (delimited.py:176-189 builds
            # fields{index: canonical} from the header line, and the row
            # loop's dict assignment makes the LAST NON-EMPTY column win
            # a term claimed by several headers, :265-268 — empty values
            # never assign, so an earlier non-empty value survives a
            # later blank duplicate). Working from the raw header also
            # covers LITERAL duplicate headers, which Spark's reader
            # renames positionally (genus, genus -> genus0, genus1) and
            # a name-based rename could never reunite.
            from idb_backend_spark.functions.grabbers import blank_to_null

            groups: dict[str, list[str]] = {}
            order: list[str] = []
            for pos, verbatim in enumerate(raw):
                term, _cls = get_canonical_name(verbatim)
                if term is None:
                    # registry marks the column as bookkeeping — drop
                    continue
                if term not in groups:
                    groups[term] = []
                    order.append(term)
                groups[term].append(data_cols[pos])
            sel = []
            for term in order:
                srcs = [F.col(f"`{c}`") for c in groups[term]]
                if len(srcs) == 1:
                    expr = srcs[0]
                else:
                    # last non-empty wins: blank-after-strip values are
                    # skipped by the reference's fold, so coalesce the
                    # blank-nulled columns in reverse file order
                    expr = F.coalesce(
                        *[blank_to_null(s) for s in reversed(srcs)]
                    )
                sel.append(expr.alias(term))
            df = df.select(*sel, F.col(CORRUPT_COL))
        else:
            # no byte-exact raw header (directory/glob/remote path or a
            # non-transparent encoding): name-based rename, no fold —
            # a duplicate-canonical pair keeps the second column
            # verbatim here (renaming both would produce duplicate
            # columns and an ambiguous-reference failure)
            renames, drops = {}, []
            claimed: dict[str, str] = {}
            dup_pairs: list[tuple[str, str]] = []
            for c in data_cols:
                term, _cls = get_canonical_name(c)
                if term is None:
                    drops.append(c)
                    continue
                if term in claimed or (term != c and term in df.columns):
                    dup_pairs.append((c, term))
                elif term != c:
                    renames[c] = term
                    claimed[term] = c
                else:
                    claimed[term] = c
            dup_terms = {t for _, t in dup_pairs}
            if not dup_terms:
                # literal/case-duplicate headers never reach this branch
                # as duplicates: Spark's CSV reader already renamed them
                # positionally (genus,Genus -> genus0,Genus1). Recover
                # the verbatim headers of the LOCAL files the scan
                # listed and check those — exact, header-line reads
                # only; remote URIs stay undetectable and undetected.
                from urllib.parse import unquote, urlparse

                # header-line reads only, capped: a feed's files share
                # one header shape, so probing a handful is enough —
                # never an O(file-count) driver loop on a big directory
                for uri in df.inputFiles()[:8]:
                    if not uri.startswith("file:"):
                        continue
                    hdr = _raw_header(
                        unquote(urlparse(uri).path),
                        normalize_delimiter(sep),
                        quote,
                        encoding,
                    )
                    if not hdr:
                        continue
                    terms = [get_canonical_name(h)[0] for h in hdr]
                    terms = [t for t in terms if t is not None]
                    dup_terms |= {
                        t for t in terms if terms.count(t) > 1
                    }
            if dup_terms:
                # the same bytes read as a local single file would FOLD
                # these columns (last non-empty wins, the positional
                # branch above); here they silently stay separate and
                # etags can differ by path spelling — surface it
                # (ADVICE r14)
                import warnings

                warnings.warn(
                    "duplicate canonical header(s) "
                    f"{sorted(dup_terms)} in {path!r} read without a "
                    "byte-exact raw header (directory/glob/URI path): "
                    "columns kept verbatim instead of folded — the same "
                    "file read as a local single path would fold them "
                    "(last non-empty wins)",
                    stacklevel=2,
                )
            df = df.drop(*drops).withColumnsRenamed(renames)
    out_cols = [c for c in df.columns if c != CORRUPT_COL]
    if blank_as_null:
        from idb_backend_spark.functions.grabbers import blank_to_null

        df = df.select(
            *[
                blank_to_null(F.col(f"`{c}`")).alias(c)
                for c in out_cols
            ],
            F.col(CORRUPT_COL),
        )
    # flag_encoding_error — the reference registers a codecs error
    # handler that splices a literal "DECODEERROR:<hexbytes>" marker
    # into any field whose bytes fail the declared charset
    # (delimited.py:42-47). Spark's JVM-side charset decode substitutes
    # U+FFFD instead, so the BAD BYTES are unrecoverable here — a
    # declared boundary — but the SIGNAL is not: any U+FFFD in any
    # field marks the row, the same row-level fact the reference's
    # marker carries downstream.
    had_decode_error = reduce(
        or_,
        [F.coalesce(F.col(f"`{c}`").contains("�"), F.lit(False))
         for c in out_cols],
        F.lit(False),
    )
    return df.withColumns(
        {
            "flag_corrupt_row": F.col(CORRUPT_COL).isNotNull(),
            "flag_encoding_error": had_decode_error,
        }
    ).drop(CORRUPT_COL)
