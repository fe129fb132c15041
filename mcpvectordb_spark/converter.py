"""Format conversion: raw bytes → Markdown text.

The reference shells 25 formats through MarkItDown (/root/reference/src/
mcpvectordb/converter.py:44-68, allowlist 13-39).  Here: text formats are
converted with dependency-free logic; pdf/docx/pptx/xlsx AND the legacy
OLE2 doc/ppt/xls go through the pure-stdlib extractors in
:mod:`mcpvectordb_spark.extractors`; zip archives convert
member-by-member through the same converter (stdlib ``zipfile``); only
the OCR/ASR formats (images, audio) remain stubbed — those produce a
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


def convert_bytes(raw: bytes, file_type: str, _depth: int = 0) -> str:
    """Pure converter for one payload. Raises on unsupported binary formats
    (caller converts the exception into an error row)."""
    if file_type == "zip":
        return _convert_zip(raw, _depth)
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
    if file_type == "doc":
        from mcpvectordb_spark.extractors import extract_doc

        return extract_doc(raw)
    if file_type == "ppt":
        from mcpvectordb_spark.extractors import extract_ppt

        return extract_ppt(raw)
    if file_type == "xls":
        from mcpvectordb_spark.extractors import extract_xls

        return extract_xls(raw)
    if file_type == "flac":
        # REAL codec: pure-Python FLAC decode (mcpvectordb_spark/flac.py —
        # Rice residuals, fixed/LPC prediction, stereo decorrelation, CRC
        # checks), then the same tone-ASR gate as the wav path.
        from mcpvectordb_spark.asr import asr_tones_pcm
        from mcpvectordb_spark.flac import decode_flac

        try:
            dec = decode_flac(raw)
        except ValueError:
            dec = None
        if dec is not None and dec["channels_pcm"] and dec["channels_pcm"][0]:
            # downmix any channel count to mono (plain average — the codec
            # has already undone mid-side decorrelation) and rescale
            # 8/12/20/24/32-bit samples to the 16-bit range the tone
            # decoder's amplitude gate expects
            chans = dec["channels_pcm"]
            n = min(len(c) for c in chans)
            if len(chans) == 1:
                mono = chans[0]
            else:
                nch = len(chans)
                mono = [sum(c[i] for c in chans) // nch for i in range(n)]
            shift = dec["bits_per_sample"] - 16
            if shift > 0:
                mono = [s >> shift for s in mono]
            elif shift < 0:
                mono = [s << -shift for s in mono]
            text = asr_tones_pcm(mono, dec["sample_rate"])
            if text:
                return text
        raise NotImplementedError(
            "'flac' payload decoded but is not machine-generated tone audio; "
            "speech transcription requires a learned model — not available "
            "in this environment"
        )
    if file_type == "wav":
        # REAL for machine-generated tone encodings (the DTMF problem
        # class): silence-gated segmentation + zero-crossing frequency
        # estimation over the repo's own RIFF/WAVE parse
        # (mcpvectordb_spark/asr.py).  Natural speech fails the decode
        # gate and keeps the documented error-row contract.
        from mcpvectordb_spark.asr import asr_tones

        text = asr_tones(raw)
        if text:
            return text
        raise NotImplementedError(
            "'wav' payload is not machine-generated tone audio; speech "
            "transcription requires a learned model — not available in this environment"
        )
    if file_type in ("png", "bmp", "gif", "jpg", "jpeg"):
        # REAL for machine-rendered monospace text (screenshots, rendered
        # labels): template-matching OCR over the decoded pixels
        # (mcpvectordb_spark/ocr.py).  Photographs / scans fail the glyph
        # confidence gate and keep the documented error-row contract —
        # never silent garbage.
        from mcpvectordb_spark.ocr import ocr_bitmap

        text = ocr_bitmap(raw)
        if text:
            return text
        raise NotImplementedError(
            f"'{file_type}' payload is not machine-rendered text; photographic "
            "OCR requires a learned model — not available in this environment"
        )
    if file_type in DEFAULT.supported_extensions:
        raise NotImplementedError(
            f"converter for '{file_type}' requires OCR/ASR — not available in this environment"
        )
    raise ValueError(f"unsupported format: {file_type!r}")


# zip members whose payload would decompress beyond this are skipped with a
# note instead of inflated — a single hostile member must not OOM the task.
_ZIP_MEMBER_CAP = 50 * 1024 * 1024
_ZIP_MAX_DEPTH = 2  # zip-in-zip is followed once; deeper nesting is noted


def _convert_zip(raw: bytes, depth: int) -> str:
    """Zip archives convert member-by-member through this same converter and
    concatenate with a per-member heading (the reference's zip path:
    converter.py:13-39 routes .zip through MarkItDown, whose ZipConverter
    does exactly this).  Member order is archive order — deterministic for
    a given file.  Unconvertible members become inline notes, not failures:
    one bad member must not sink the whole archive (the reference's
    batch-continues contract at the member level)."""
    import io
    import zipfile

    if depth >= _ZIP_MAX_DEPTH:
        raise ValueError(f"zip nesting deeper than {_ZIP_MAX_DEPTH} levels")
    parts: list[str] = []
    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            name = info.filename
            ext = name.rsplit(".", 1)[-1].lower() if "." in name else ""
            parts.append(f"## {name}")
            if info.file_size > _ZIP_MEMBER_CAP:
                parts.append(f"[skipped: member exceeds {_ZIP_MEMBER_CAP} bytes]")
                continue
            try:
                parts.append(convert_bytes(zf.read(info), ext, _depth=depth + 1))
            except Exception as exc:
                parts.append(f"[unconverted: {type(exc).__name__}: {exc}]")
    if not parts:
        return ""
    return "\n\n".join(parts)


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
