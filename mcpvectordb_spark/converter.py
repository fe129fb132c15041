"""Format conversion: raw bytes → Markdown text.

The reference shells 25 formats through MarkItDown (/root/reference/src/
mcpvectordb/converter.py:44-68, allowlist 13-39).  Here: text formats are
converted with dependency-free logic; pdf/docx/pptx/xlsx go through the
pure-stdlib extractors in :mod:`mcpvectordb_spark.extractors`; only the
OCR/ASR formats (images, audio) remain stubbed — those produce a
``failed`` status row with a clear error, never an exception (the
batch-continues contract, ingestor.py:104-118).

Shape: an Arrow-batched ``mapInPandas`` stage over binaryFile rows — the
UDF-singleton pattern the heavy converter would use (SURVEY.md §2.1 S4).
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator
from typing import TYPE_CHECKING

from mcpvectordb_spark.config import DEFAULT, EngineConfig

if TYPE_CHECKING:
    import pandas as pd
    from pyspark.sql import DataFrame

_TAG_RE = re.compile(r"<script.*?</script>|<style.*?</style>|<[^>]+>", re.S | re.I)


def convert_bytes(raw: bytes, file_type: str) -> str:
    """Pure converter for one payload. Raises on unsupported binary formats
    (caller converts the exception into an error row)."""
    if file_type in ("txt", "md", "markdown", "csv"):
        return raw.decode("utf-8", errors="replace")
    if file_type == "json":
        return "```json\n" + json.dumps(json.loads(raw.decode("utf-8", errors="replace")), indent=2) + "\n```"
    if file_type in ("html", "htm", "xml"):
        text = _TAG_RE.sub(" ", raw.decode("utf-8", errors="replace"))
        return re.sub(r"[ \t]+", " ", text).strip()
    if file_type == "pdf":
        from mcpvectordb_spark.extractors import extract_pdf

        return extract_pdf(raw)
    if file_type == "docx":
        from mcpvectordb_spark.extractors import extract_docx

        return extract_docx(raw)
    if file_type == "pptx":
        from mcpvectordb_spark.extractors import extract_pptx

        return extract_pptx(raw)
    if file_type == "xlsx":
        from mcpvectordb_spark.extractors import extract_xlsx

        return extract_xlsx(raw)
    if file_type in DEFAULT.supported_extensions:
        raise NotImplementedError(
            f"converter for '{file_type}' requires OCR/ASR — not available in this environment"
        )
    raise ValueError(f"unsupported format: {file_type!r}")


def convert_stage(
    df: "DataFrame",
    bytes_col: str = "raw_bytes",
    type_col: str = "file_type",
    out_col: str = "content",
    config: EngineConfig = DEFAULT,
) -> "DataFrame":
    """binaryFile rows → text rows with (content, convert_error) columns."""
    passthrough = [c for c in df.columns if c != bytes_col]
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema if f.name != bytes_col]
        + [f"`{out_col}` string", "`convert_error` string"]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            texts, errors = [], []
            for raw, ftype in zip(pdf[bytes_col], pdf[type_col]):
                try:
                    texts.append(convert_bytes(bytes(raw) if raw is not None else b"", str(ftype)))
                    errors.append(None)
                except Exception as exc:  # one bad file never stops the batch
                    texts.append(None)
                    errors.append(f"{type(exc).__name__}: {exc}")
            out = pdf[passthrough].copy()
            out[out_col] = texts
            out["convert_error"] = errors
            yield out

    return df.mapInPandas(run, schema=out_schema)
