"""Machine-rendered-text OCR: a real template-matching kernel for the
converter's image path (SURVEY §2.1 S4 — the reference routes images
through MarkItDown's OCR, /root/reference/src/mcpvectordb/converter.py:13-39).

Scope is stated honestly: this recognizes MONOSPACE BITMAP-FONT renderings
(screenshots of terminals, rendered labels, the fixtures this repo
generates) by exact-grid template matching against the embedded 5×7 font —
the classic pre-neural OCR pipeline (binarize → segment fixed-pitch cells →
nearest-template by Hamming distance).  Scanned documents and photographs
need a learned model and still produce the documented error row; the
converter falls back to that whenever glyph confidence is low, so a real
photo can never silently convert to garbage.

Pure stdlib + numpy; per-payload work is Arrow-kernel class (the
chunker/embedder discipline) — no Spark shuffle is introduced by OCR, it
slots into the existing convert stage.
"""

from __future__ import annotations

# 5×7 monospace font, one string per pixel row, '#' = ink.  Glyphs are
# mutually distinct (pairwise Hamming ≥ 2 — pinned by test); the renderer
# and the recognizer share this single table.
FONT_5X7: dict[str, tuple[str, ...]] = {
    "A": (".###.", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    "B": ("####.", "#...#", "#...#", "####.", "#...#", "#...#", "####."),
    "C": (".###.", "#...#", "#....", "#....", "#....", "#...#", ".###."),
    "D": ("####.", "#...#", "#...#", "#...#", "#...#", "#...#", "####."),
    "E": ("#####", "#....", "#....", "####.", "#....", "#....", "#####"),
    "F": ("#####", "#....", "#....", "####.", "#....", "#....", "#...."),
    "G": (".###.", "#...#", "#....", "#.###", "#...#", "#...#", ".###."),
    "H": ("#...#", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    "I": ("#####", "..#..", "..#..", "..#..", "..#..", "..#..", "#####"),
    "J": ("..###", "...#.", "...#.", "...#.", "...#.", "#..#.", ".##.."),
    "K": ("#...#", "#..#.", "#.#..", "##...", "#.#..", "#..#.", "#...#"),
    "L": ("#....", "#....", "#....", "#....", "#....", "#....", "#####"),
    "M": ("#...#", "##.##", "#.#.#", "#.#.#", "#...#", "#...#", "#...#"),
    "N": ("#...#", "##..#", "#.#.#", "#..##", "#...#", "#...#", "#...#"),
    "O": (".###.", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    "P": ("####.", "#...#", "#...#", "####.", "#....", "#....", "#...."),
    "Q": (".###.", "#...#", "#...#", "#...#", "#.#.#", "#..#.", ".##.#"),
    "R": ("####.", "#...#", "#...#", "####.", "#.#..", "#..#.", "#...#"),
    "S": (".####", "#....", "#....", ".###.", "....#", "....#", "####."),
    "T": ("#####", "..#..", "..#..", "..#..", "..#..", "..#..", "..#.."),
    "U": ("#...#", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    "V": ("#...#", "#...#", "#...#", "#...#", "#...#", ".#.#.", "..#.."),
    "W": ("#...#", "#...#", "#...#", "#.#.#", "#.#.#", "##.##", "#...#"),
    "X": ("#...#", "#...#", ".#.#.", "..#..", ".#.#.", "#...#", "#...#"),
    "Y": ("#...#", "#...#", ".#.#.", "..#..", "..#..", "..#..", "..#.."),
    "Z": ("#####", "....#", "...#.", "..#..", ".#...", "#....", "#####"),
    "0": (".###.", "#...#", "#..##", "#.#.#", "##..#", "#...#", ".###."),
    "1": ("..#..", ".##..", "..#..", "..#..", "..#..", "..#..", ".###."),
    "2": (".###.", "#...#", "....#", "...#.", "..#..", ".#...", "#####"),
    "3": (".###.", "#...#", "....#", "..##.", "....#", "#...#", ".###."),
    "4": ("...#.", "..##.", ".#.#.", "#..#.", "#####", "...#.", "...#."),
    "5": ("#####", "#....", "####.", "....#", "....#", "#...#", ".###."),
    "6": (".###.", "#....", "#....", "####.", "#...#", "#...#", ".###."),
    "7": ("#####", "....#", "...#.", "..#..", ".#...", ".#...", ".#..."),
    "8": (".###.", "#...#", "#...#", ".###.", "#...#", "#...#", ".###."),
    "9": (".###.", "#...#", "#...#", ".####", "....#", "....#", ".###."),
    ".": (".....", ".....", ".....", ".....", ".....", ".##..", ".##.."),
    ",": (".....", ".....", ".....", ".....", ".##..", "..#..", ".#..."),
    "-": (".....", ".....", ".....", "#####", ".....", ".....", "....."),
    ":": (".....", ".##..", ".##..", ".....", ".##..", ".##..", "....."),
    " ": (".....", ".....", ".....", ".....", ".....", ".....", "....."),
}

GLYPH_W, GLYPH_H = 5, 7
PITCH_X, PITCH_Y = 6, 9  # 1px inter-glyph gap, 2px inter-line gap
PAD = 2  # margin around the text block

_CHARSET = "".join(FONT_5X7)


def _glyph_bits(glyph: tuple[str, ...]) -> int:
    bits = 0
    for row in glyph:
        for c in row:
            bits = (bits << 1) | (1 if c == "#" else 0)
    return bits


_TEMPLATES: list[tuple[str, int]] = [(ch, _glyph_bits(g)) for ch, g in FONT_5X7.items()]


def renderable(text: str) -> str:
    """Uppercase + project onto the font charset (unknown chars → space)."""
    out = []
    for ch in text.upper():
        out.append(ch if ch in FONT_5X7 or ch == "\n" else " ")
    return "".join(out)


def render_text_bmp(text: str) -> bytes:
    """Render text (multi-line) to a 24-bit BMP, black ink on white, at
    the fixed 6×9 glyph pitch — the fixture generator for the OCR path
    and a deterministic stand-in for 'a screenshot of text'."""
    import struct

    lines = renderable(text).split("\n") or [""]
    n_cols = max((len(l) for l in lines), default=0) or 1
    w = PAD * 2 + n_cols * PITCH_X
    h = PAD * 2 + len(lines) * PITCH_Y
    # white canvas, row-major top-down
    canvas = [[255] * w for _ in range(h)]
    for ly, line in enumerate(lines):
        for lx, ch in enumerate(line):
            glyph = FONT_5X7.get(ch)
            if glyph is None:
                continue
            x0 = PAD + lx * PITCH_X
            y0 = PAD + ly * PITCH_Y + 1
            for gy, row in enumerate(glyph):
                for gx, c in enumerate(row):
                    if c == "#":
                        canvas[y0 + gy][x0 + gx] = 0
    row_size = (w * 3 + 3) & ~3
    data = b""
    for y in range(h - 1, -1, -1):  # BMP stores bottom-up
        row = b"".join(bytes((v, v, v)) for v in canvas[y])
        data += row + b"\x00" * (row_size - w * 3)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0)
    return b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54) + info + data


def ocr_pixels(px, min_confidence: float = 0.85) -> str | None:
    """Template-match a decoded HxWx3 pixel array back to text.

    Binarize at mid-gray, walk the fixed glyph grid, pack each 5×7 cell
    to a 35-bit signature, take the nearest font template by Hamming
    distance (≤ 4 bits of damage tolerated — noise robustness without
    cross-glyph ambiguity, since the font's pairwise distance floor is
    pinned ≥ 2 by test and real confusions sit much further apart).
    Returns None when fewer than ``min_confidence`` of non-space cells
    match — the photo-not-screenshot signal the converter turns into its
    documented error row."""
    import numpy as np

    if px is None or px.ndim != 3 or px.shape[0] < PAD * 2 + GLYPH_H:
        return None
    gray = px.mean(axis=2)
    ink = gray < 128
    h, w = ink.shape
    n_cols = (w - 2 * PAD) // PITCH_X
    n_rows = (h - 2 * PAD) // PITCH_Y
    if n_cols <= 0 or n_rows <= 0:
        return None
    lines, matched, total = [], 0, 0
    for ly in range(n_rows):
        out = []
        for lx in range(n_cols):
            x0 = PAD + lx * PITCH_X
            y0 = PAD + ly * PITCH_Y + 1
            cell = ink[y0 : y0 + GLYPH_H, x0 : x0 + GLYPH_W]
            if cell.shape != (GLYPH_H, GLYPH_W):
                out.append("?")
                continue
            sig = 0
            for gy in range(GLYPH_H):
                for gx in range(GLYPH_W):
                    sig = (sig << 1) | int(cell[gy, gx])
            best_ch, best_d = "?", 99
            for ch, bits in _TEMPLATES:
                d = (sig ^ bits).bit_count()
                if d < best_d:
                    best_ch, best_d = ch, d
            if best_d > 4:
                best_ch = "?"
            if best_ch != " ":
                total += 1
                if best_ch != "?":
                    matched += 1
            out.append(best_ch)
        lines.append("".join(out).rstrip())
    while lines and not lines[-1]:
        lines.pop()
    if total > 0 and matched / total < min_confidence:
        return None
    return "\n".join(lines).rstrip()


def ocr_bitmap(payload: bytes) -> str | None:
    """Decode any supported image container (PNG/BMP/GIF/JPEG via the
    multimodal pixel kernels) and template-match it back to text; None =
    undecodable or not machine-rendered text."""
    from mcpvectordb_spark.sources.multimodal import decode_image_pixels

    return ocr_pixels(decode_image_pixels(payload))
