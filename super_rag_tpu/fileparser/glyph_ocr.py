"""Offline OCR for machine-rendered text: glyph-template correlation.

The reference's OCR capability comes from MinerU/Docling model bundles
(reference: super_rag/fileparser/mineru_parser.py:33-47,
docling_parser.py:49-53); neither ships in this image and there is no
tesseract binary, so scanned PDFs previously had no offline recourse
beyond the vision-caption ladder.  This engine recovers text from
CLEAN machine-rendered page images — the dominant "scanned PDF" case
of a digital document printed/rasterised to bitmap:

  1. Otsu binarisation with polarity detection (dark-on-light or
     light-on-dark both work);
  2. line segmentation by horizontal projection profile;
  3. glyph segmentation by per-line column-ink runs (a maximal run of
     inked columns is one glyph — this keeps i/j dots, ':' and '%'
     attached to their bodies with no connected-component pass);
  4. classification of EVERY glyph on the page in ONE matmul:
     ``[n_glyphs, F] @ [F, n_templates]`` cosine scores, argmax.
     F = 16x16 aspect-normalised bitmap (256) + 3 scaled line-metric
     features — height/cap-height, top offset, baseline offset — which
     disambiguate the scale/position confusables a bitmap alone cannot
     (c/C, o/O, p/P, w/W, apostrophe/comma, period/quote).

Templates are rendered once per process from the DejaVu family baked
into the image (Sans/Serif/Mono, regular+bold).  Accuracy is
near-exact on pages rendered in those fonts and degrades gracefully on
other clean fonts; handwriting, heavy sensor noise, and skewed scans
are out of scope (such pages still flow to index/vision.py captioning,
as before).  Pure numpy + PIL: no network, no model downloads, and the
classification step is a single dense matmul — the same shape the TPU
engine favours — though at ingest-side volumes the host BLAS is ample.
"""

from __future__ import annotations

import io
from typing import Optional

import numpy as np

from super_rag_tpu.fileparser.ocr import OCREngine

# normalised glyph bitmap edge; 16x16 keeps the template matrix tiny
# while remaining unambiguous for the DejaVu shapes
_BMP = 16
# weight of each scalar line-metric feature relative to the
# unit-normalised 256-dim bitmap block (tuned on the fixture pages:
# large enough to separate c/C and comma/quote even at small render
# sizes where bitmap cosines between the case pair approach 1.0)
_METRIC_W = 0.8

# glyph pairs DejaVu renders with overlapping column extents (the f
# hook reaches over the next glyph), so segmentation sees one run;
# templating the fused pair beats trying to cut it apart
_PAIR_TEMPLATES = ("fi", "fl", "ff", "fj", "ft", "fo", "fa", "fe",
                   "fu", "fr", "fs", "fc", "fg")

_FONT_PATHS = (
    "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSerif-Bold.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf",
)
_CHARS = [chr(c) for c in range(33, 127)]


def _otsu_threshold(gray: np.ndarray) -> float:
    hist = np.bincount(gray.reshape(-1), minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 127.0
    w = np.cumsum(hist)
    m = np.cumsum(hist * np.arange(256))
    mean_total = m[-1] / total
    w0 = w / total
    w1 = 1.0 - w0
    mu0 = np.where(w > 0, m / np.maximum(w, 1), 0)
    mu1 = np.where(w1 > 0, (m[-1] - m) / np.maximum(total - w, 1), 0)
    between = w0 * w1 * (mu0 - mu1) ** 2
    between[~np.isfinite(between)] = 0
    # exclude the degenerate all-one-side splits
    t = int(np.argmax(between))
    if between[t] <= 0:
        return float(mean_total)
    return float(t)


def _binarize(gray: np.ndarray) -> np.ndarray:
    """uint8 grayscale -> bool ink mask (True = glyph pixel)."""
    thr = _otsu_threshold(gray)
    ink = gray < thr
    if ink.mean() > 0.5:  # light text on dark background
        ink = ~ink
    return ink


def _runs(mask_1d: np.ndarray) -> list[tuple[int, int]]:
    """Maximal [start, stop) runs of True."""
    idx = np.flatnonzero(np.diff(np.concatenate(
        ([0], mask_1d.astype(np.int8), [0]))))
    return [(int(idx[i]), int(idx[i + 1])) for i in range(0, len(idx), 2)]


def _segment_lines(ink: np.ndarray) -> list[tuple[int, int]]:
    h, w = ink.shape
    profile = ink.sum(axis=1)
    rows = profile > max(0, w // 1500)  # tolerate a few noise pixels/row
    runs = _runs(rows)
    if not runs:
        return []
    # re-attach satellite rows (umlauts, detached dots rendered a row
    # apart from the body) to the adjacent line
    heights = np.array([b - a for a, b in runs], dtype=np.float64)
    med_h = float(np.median(heights)) or 1.0
    merged: list[tuple[int, int]] = [runs[0]]
    for a, b in runs[1:]:
        pa, pb = merged[-1]
        if a - pb <= max(1, int(0.15 * med_h)):
            merged[-1] = (pa, b)
        else:
            merged.append((a, b))
    return merged


def _normalize_glyph(crop: np.ndarray) -> np.ndarray:
    """bool glyph crop -> unit-norm flattened _BMPx_BMP bitmap."""
    from PIL import Image

    h, w = crop.shape
    side = max(h, w)
    sq = np.zeros((side, side), dtype=np.uint8)
    y0 = (side - h) // 2
    x0 = (side - w) // 2
    sq[y0:y0 + h, x0:x0 + w] = crop.astype(np.uint8) * 255
    img = Image.fromarray(sq, mode="L").resize((_BMP, _BMP),
                                               Image.BILINEAR)
    v = np.asarray(img, dtype=np.float64).reshape(-1)
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def _feature_vector(bitmap: np.ndarray, h_rel: float, top_rel: float,
                    bot_rel: float, w_rel: float) -> np.ndarray:
    """``w_rel`` (glyph width / cap height) penalises a merged pair of
    glyphs matching a single wide template ('fiv' vs 'fo', 've' vs 'w')
    — the bitmap alone squashes both to the same 16x16 square."""
    scal = np.clip(np.array([h_rel, top_rel, bot_rel, w_rel]), -1.5, 2.5)
    v = np.concatenate([bitmap, _METRIC_W * scal])
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


class _Templates:
    """Glyph templates rendered from the baked-in DejaVu fonts."""

    def __init__(self) -> None:
        from PIL import Image, ImageDraw, ImageFont

        feats: list[np.ndarray] = []
        chars: list[str] = []
        font_ids: list[int] = []
        # per font id: {char: (advance/cap_h, left bearing/cap_h)} and
        # the space advance / cap_h — used for pen-residual spacing
        self.font_adv: dict[int, dict[str, tuple[float, float]]] = {}
        self.font_space: dict[int, float] = {}
        # multiple render sizes per font: 48 px for clean shapes, small
        # sizes so the template set also contains the thin-stroke/
        # antialiased variants small renders binarise to (a 24 px serif
        # 'b' loses half its bowl and otherwise matches 'h').  Bold
        # fonts skip the small sizes: their strokes never thin out, and
        # small bold renders binarise to degenerate blobs whose
        # templates only create confusions (bold 'e' matching the
        # filled-counter 'o').
        for fid, path in enumerate(_FONT_PATHS):
            sizes = (48,) if "Bold" in path else (48, 24, 20)
            for size in sizes:
                try:
                    font = ImageFont.truetype(path, size)
                except OSError:
                    continue
                ascent, _descent = font.getmetrics()
                bx = font.getbbox("X")
                cap_top, baseline = float(bx[1]), float(ascent)
                cap_h = max(baseline - cap_top, 1.0)
                if size == 48:
                    self.font_space[fid] = font.getlength(" ") / cap_h
                    metrics = self.font_adv.setdefault(fid, {})
                for ch in list(_CHARS) + list(_PAIR_TEMPLATES):
                    bb = font.getbbox(ch)
                    if bb is None or bb[2] <= bb[0] or bb[3] <= bb[1]:
                        continue
                    wd, ht = bb[2] - bb[0], bb[3] - bb[1]
                    img = Image.new("L", (wd + 2, ht + 2), 0)
                    ImageDraw.Draw(img).text((1 - bb[0], 1 - bb[1]), ch,
                                             font=font, fill=255)
                    arr = np.asarray(img) > 96
                    ys, xs = np.nonzero(arr)
                    if len(ys) == 0:
                        continue
                    crop = arr[ys.min():ys.max() + 1, xs.min():xs.max() + 1]
                    bmp = _normalize_glyph(crop)
                    h_rel = ht / cap_h
                    top_rel = (bb[1] - cap_top) / cap_h
                    bot_rel = (bb[3] - baseline) / cap_h
                    feats.append(
                        _feature_vector(bmp, h_rel, top_rel, bot_rel,
                                        wd / cap_h))
                    chars.append(ch)
                    font_ids.append(fid)
                    if size == 48 and len(ch) == 1:
                        metrics[ch] = (font.getlength(ch) / cap_h,
                                       bb[0] / cap_h)
        if not feats:
            raise RuntimeError("no usable fonts for glyph templates")
        self.matrix = np.stack(feats)  # [T, F]
        self.chars = chars
        self.font_id = np.array(font_ids)


_TEMPLATES: Optional[_Templates] = None


def _templates() -> _Templates:
    global _TEMPLATES
    if _TEMPLATES is None:
        _TEMPLATES = _Templates()
    return _TEMPLATES


class _Glyph:
    __slots__ = ("line", "x0", "x1", "y0", "y1", "crop")

    def __init__(self, line: int, x0: int, x1: int, y0: int, y1: int,
                 crop: np.ndarray) -> None:
        self.line, self.x0, self.x1 = line, x0, x1
        self.y0, self.y1 = y0, y1
        self.crop = crop


def _line_glyphs(ink: np.ndarray, line_no: int, top: int,
                 bottom: int) -> list[_Glyph]:
    strip = ink[top:bottom]
    cols = strip.sum(axis=0) > 0
    out: list[_Glyph] = []
    for x0, x1 in _runs(cols):
        sub = strip[:, x0:x1]
        rows = np.flatnonzero(sub.sum(axis=1))
        if len(rows) == 0:
            continue
        y0, y1 = int(rows[0]), int(rows[-1]) + 1
        crop = sub[y0:y1]
        if crop.sum() < 2 and crop.shape[0] <= 1 and crop.shape[1] <= 1:
            continue  # isolated speck
        out.append(_Glyph(line_no, x0, x1, top + y0, top + y1, crop))
    return out


def _line_frame(glyphs: list[_Glyph]) -> tuple[float, float]:
    """(cap_top, baseline) for one line's glyph boxes.

    baseline = median glyph bottom (descenders are a minority in
    running text); cap_top = low percentile of the tops of glyphs that
    actually sit on the baseline (so descenders do not drag it down).
    """
    bottoms = np.array([g.y1 for g in glyphs], dtype=np.float64)
    tops = np.array([g.y0 for g in glyphs], dtype=np.float64)
    baseline = float(np.median(bottoms))
    span = max(baseline - tops.min(), 1.0)
    on_base = np.abs(bottoms - baseline) <= 0.25 * span
    base_tops = tops[on_base] if on_base.any() else tops
    cap_top = float(np.percentile(base_tops, 10))
    if baseline - cap_top < 2:
        cap_top = float(tops.min())
    return cap_top, baseline


def _classify(
    glyphs: list[_Glyph], frames: dict[int, tuple[float, float]],
    tm: _Templates, fids: Optional[np.ndarray] = None,
) -> tuple[list[str], np.ndarray, np.ndarray]:
    """``fids``: optional per-glyph font-id restriction — the second
    pass scores each glyph only against its line's voted font, which
    kills cross-font confusions (a serif-bold 'wi' matching a sans
    'fu' template) and makes the advance metrics trustworthy."""
    if not glyphs:
        return [], np.zeros(0), np.zeros(0, np.int64)
    feats = np.zeros((len(glyphs), tm.matrix.shape[1]))
    for i, g in enumerate(glyphs):
        cap_top, baseline = frames[g.line]
        cap_h = max(baseline - cap_top, 1.0)
        bmp = _normalize_glyph(g.crop)
        feats[i] = _feature_vector(
            bmp,
            (g.y1 - g.y0) / cap_h,
            (g.y0 - cap_top) / cap_h,
            (g.y1 - baseline) / cap_h,
            (g.x1 - g.x0) / cap_h,
        )
    scores = feats @ tm.matrix.T  # [n, T] — the whole page in one matmul
    if fids is not None:
        scores = np.where(tm.font_id[None, :] == fids[:, None],
                          scores, -1.0)
    best = scores.argmax(axis=1)
    conf = scores[np.arange(len(glyphs)), best]
    return [tm.chars[int(b)] for b in best], conf, best


def _band_extent(g: _Glyph, baseline: float, cap_h: float) -> tuple[int, int]:
    """Column extent of the glyph ABOVE the descender band.

    Descender hooks (j, g, y) sweep left/right below the baseline and
    eat the visual word gap; spaces are judged on the x-height band
    instead.  Falls back to the full extent for glyphs that live below
    the baseline (comma tails).
    """
    cut = int(round(baseline + 0.15 * cap_h)) - g.y0
    if cut <= 0:
        return g.x0, g.x1
    band = g.crop[:cut]
    cols = np.flatnonzero(band.sum(axis=0))
    if len(cols) == 0:
        return g.x0, g.x1
    return g.x0 + int(cols[0]), g.x0 + int(cols[-1]) + 1


def _space_threshold(gaps: np.ndarray, cap_h: float) -> float:
    """Per-line word-gap threshold: 1-D Otsu over the observed gaps
    when they are clearly bimodal (letter gaps vs word gaps), else a
    cap-height fraction (word spacing ~0.6 cap-height in text fonts,
    letter gaps ~0.1-0.35)."""
    fallback = max(2.0, 0.42 * cap_h)
    if len(gaps) < 6:
        return fallback
    g = np.sort(gaps.astype(np.float64))
    best_t, best_var = None, 0.0
    for i in range(1, len(g)):
        lo, hi = g[:i], g[i:]
        var = len(lo) * len(hi) * (hi.mean() - lo.mean()) ** 2
        if var > best_var:
            best_var, best_t = var, (lo[-1] + hi[0]) / 2.0
            lo_mean, hi_mean = lo.mean(), hi.mean()
    if best_t is not None and hi_mean >= 2.0 * max(lo_mean, 0.02 * cap_h) \
            and hi_mean >= 0.25 * cap_h:
        return float(best_t)
    return fallback


def _cut_candidates(colsum: np.ndarray, w: int, n: int = 6) -> list[int]:
    """Up to ``n`` interior cut columns, lowest-ink first, >=3 px apart.

    A single argmin often lands inside the second glyph's bowl (thin
    top/bottom arcs score as low as the true boundary), so the retry
    tries several minima and keeps whichever split classifies best.
    """
    lo, hi = max(1, int(0.2 * w)), min(w - 1, int(0.8 * w) + 1)
    if hi <= lo:
        return []
    order = np.argsort(colsum[lo:hi], kind="stable") + lo
    picked: list[int] = []
    for c in order:
        c = int(c)
        if all(abs(c - p) >= 3 for p in picked):
            picked.append(c)
        if len(picked) >= n:
            break
    return picked


def _split_at(g: _Glyph, cut: int) -> Optional[tuple[_Glyph, _Glyph]]:
    halves = []
    for off, part in ((0, g.crop[:, :cut]), (cut, g.crop[:, cut:])):
        rows = np.flatnonzero(part.sum(axis=1))
        cols = np.flatnonzero(part.sum(axis=0))
        if len(rows) == 0 or len(cols) == 0:
            return None
        crop = part[rows[0]:rows[-1] + 1, cols[0]:cols[-1] + 1]
        halves.append(_Glyph(
            g.line, g.x0 + off + int(cols[0]),
            g.x0 + off + int(cols[-1]) + 1,
            g.y0 + int(rows[0]), g.y0 + int(rows[-1]) + 1, crop))
    return halves[0], halves[1]


def _split_wide(g: _Glyph) -> list[tuple[_Glyph, _Glyph]]:
    """Candidate splits of a suspiciously-wide run (touching pair)."""
    w = g.x1 - g.x0
    if w < 6:
        return []
    colsum = g.crop.sum(axis=0)
    out = []
    for cut in _cut_candidates(colsum, w):
        pair = _split_at(g, cut)
        if pair is not None:
            out.append(pair)
    return out


def recognize_page(gray: np.ndarray) -> str:
    """uint8 grayscale page image -> recognised text (lines preserved,
    blank line between paragraph-sized vertical gaps)."""
    if gray.ndim != 2:
        raise ValueError("expected a 2-D grayscale array")
    if gray.size == 0:
        return ""
    ink = _binarize(gray)
    lines = _segment_lines(ink)
    if not lines:
        return ""
    tm = _templates()
    all_glyphs: list[_Glyph] = []
    frames: dict[int, tuple[float, float]] = {}
    for li, (top, bottom) in enumerate(lines):
        if bottom - top < 4:
            continue  # sub-4px "lines" are stripes/rules, not text
        gl = _line_glyphs(ink, li, top, bottom)
        if not gl:
            continue
        frames[li] = _line_frame(gl)
        all_glyphs.extend(gl)
    chars, conf, best = _classify(all_glyphs, frames, tm)

    # vote each line's font (confidence-weighted) and re-classify the
    # page restricted to the voted fonts
    line_fid: dict[int, int] = {}
    votes: dict[int, np.ndarray] = {}
    n_fonts = int(tm.font_id.max()) + 1
    for i, g in enumerate(all_glyphs):
        v = votes.setdefault(g.line, np.zeros(n_fonts))
        if conf[i] > 0.5:
            v[int(tm.font_id[best[i]])] += conf[i]
    for li, v in votes.items():
        line_fid[li] = int(v.argmax()) if v.sum() > 0 else 0
    glyph_fids = np.array([line_fid.get(g.line, 0) for g in all_glyphs])
    chars, conf, best = _classify(all_glyphs, frames, tm, glyph_fids)

    # per-line median glyph width (ignoring thin marks) — a run much
    # wider than it is usually two touching glyphs
    med_w: dict[int, float] = {}
    for li in frames:
        cap_h = max(frames[li][1] - frames[li][0], 1.0)
        ws = [g.x1 - g.x0 for g in all_glyphs
              if g.line == li and (g.x1 - g.x0) > 0.2 * cap_h]
        med_w[li] = float(np.median(ws)) if ws else cap_h

    # retry touching glyph clusters: wide or low-confidence runs are
    # recursively split at low-ink interior columns, keeping whichever
    # segmentation classifies best — resolves 2-, 3- and 4-glyph merges
    # ('fiv', whole short words in small serif renders)
    def _resolve(g: _Glyph, fid: int, depth: int) -> tuple[str, float]:
        c, cf, _ = _classify([g], frames, tm, np.array([fid]))
        s, sc = c[0], float(cf[0])
        wide = (g.x1 - g.x0) > 1.45 * med_w[g.line]
        if depth == 0 or (sc >= 0.93 and not wide):
            return s, sc
        for left, right in _split_wide(g):
            ls, lc = _resolve(left, fid, depth - 1)
            rs, rc = _resolve(right, fid, depth - 1)
            cand = (lc + rc) / 2
            if cand > sc + 0.02:
                s, sc = ls + rs, cand
        return s, sc

    for i, g in enumerate(all_glyphs):
        if conf[i] < 0.62 or (g.x1 - g.x0) > 1.45 * med_w[g.line]:
            s, sc = _resolve(g, line_fid.get(g.line, 0), 2)
            if sc > conf[i] + 0.02:
                chars[i], conf[i] = s, sc

    # assemble lines.  Word gaps are judged two ways:
    #  - primary: pen-advance residual — the matched template knows its
    #    font advance and side bearing, so (next pen - prev pen) minus
    #    the previous glyph's advance isolates the inserted spacing
    #    (robust to serif arms and descender hooks eating the edge gap)
    #  - fallback for low-confidence matches: edge gaps on the
    #    above-baseline band with a per-line adaptive threshold
    per_line: dict[int, list[int]] = {}
    for i, g in enumerate(all_glyphs):
        per_line.setdefault(g.line, []).append(i)
    out_lines: list[tuple[int, str]] = []
    for li, (top, bottom) in enumerate(lines):
        idxs = per_line.get(li)
        if not idxs:
            continue
        cap_top, baseline = frames[li]
        cap_h = max(baseline - cap_top, 3.0)
        bands = {i: _band_extent(all_glyphs[i], baseline, cap_h)
                 for i in idxs}
        idxs.sort(key=lambda i: bands[i][0])
        gaps = np.array([bands[b][0] - bands[a][1]
                         for a, b in zip(idxs, idxs[1:])])
        gap_thr = _space_threshold(gaps, cap_h)
        metrics = tm.font_adv.get(line_fid.get(li, 0), {})
        space_ratio = tm.font_space.get(line_fid.get(li, 0), 0.35)

        def pen_metrics(i: int) -> Optional[tuple[float, float]]:
            """(advance, left bearing) of glyph i's recognised chars in
            the line's voted font, in cap-height units."""
            if conf[i] < 0.7:
                return None
            adv = 0.0
            lsb = None
            for c in chars[i]:
                m = metrics.get(c)
                if m is None:
                    return None
                adv += m[0]
                if lsb is None:
                    lsb = m[1]
            return (adv, lsb or 0.0)

        text = chars[idxs[0]]
        for a, b in zip(idxs, idxs[1:]):
            # either signal suffices: the residual rule catches serif
            # kerning cases whose edge gap is tiny, the adaptive edge
            # rule catches small renders where the residual rounds away
            is_space = bands[b][0] - bands[a][1] >= gap_thr
            ma, mb = pen_metrics(a), pen_metrics(b)
            if not is_space and ma is not None and mb is not None:
                pen_a = bands[a][0] - ma[1] * cap_h
                pen_b = bands[b][0] - mb[1] * cap_h
                resid = (pen_b - pen_a) / cap_h - ma[0]
                is_space = (resid >= 0.5 * max(space_ratio, 0.2)
                            and resid * cap_h >= 2.0)
            if is_space:
                text += " "
            text += chars[b]
        # junk gate: figure/photo regions segment into "glyphs" that
        # decode to symbol soup; readable text is mostly alphanumeric
        body = text.replace(" ", "")
        alnum = sum(c.isalnum() for c in body)
        if body and alnum / len(body) < 0.25:
            continue
        out_lines.append((top, _context_fix(text)))
    if not out_lines:
        return ""
    # paragraph gaps -> blank line.  Base pitch = low percentile of the
    # inter-line pitches so a page that is mostly paragraph breaks (few
    # lines) still detects them; median would average the breaks in.
    pitches = [b - a for (a, _), (b, _) in zip(out_lines, out_lines[1:])]
    base_pitch = float(np.percentile(pitches, 25)) if pitches else 0.0
    parts = [out_lines[0][1]]
    for (prev_top, _), (top, text) in zip(out_lines, out_lines[1:]):
        if base_pitch and top - prev_top > 1.7 * base_pitch:
            parts.append("")
        parts.append(text)
    return "\n".join(parts)


def _context_fix(line: str) -> str:
    """Resolve glyphs whose shapes are literally identical in the sans
    fonts (DejaVu Sans 'I', 'l' and '|' are the same bare stem; 'O'/'0'
    near-identical) using neighbour context — the one place a bitmap
    matcher cannot win and a one-line prior can."""
    chars = list(line)
    n = len(chars)

    def prev_nonspace(i: int) -> str:
        for j in range(i - 1, -1, -1):
            if chars[j] != " ":
                return chars[j]
        return ""

    for i, c in enumerate(chars):
        p = chars[i - 1] if i > 0 else ""
        nx = chars[i + 1] if i + 1 < n else ""
        if c in ("I", "l", "|"):
            if p.isdigit() and (nx.isdigit() or not nx.isalnum()):
                chars[i] = "1"
            elif p.islower():
                chars[i] = "l"
            elif nx.islower() and p in ("", " "):
                # word-initial bar + lowercase: 'l' (lazy, liquor, …)
                # unless at sentence start, where 'I' (It, In, If) is
                # as likely — keep the template's pick there
                if prev_nonspace(i) not in ("", ".", "!", "?"):
                    chars[i] = "l"
            elif c == "|" and (p.isalpha() or nx.isalpha()):
                chars[i] = "l"
        elif c == "O" and p.isdigit() and nx.isdigit():
            chars[i] = "0"
        elif c == "0" and p.isalpha() and nx.isalpha():
            chars[i] = "O"
    return "".join(chars)


class GlyphOCR(OCREngine):
    """fileparser.ocr engine: always available (PIL + numpy only)."""

    name = "glyph-template"

    @classmethod
    def available(cls) -> bool:
        try:
            from PIL import Image  # noqa: F401
            return True
        except ImportError:
            return False

    def image_to_text(self, image_bytes: bytes) -> str:
        from PIL import Image

        img = Image.open(io.BytesIO(image_bytes)).convert("L")
        return recognize_page(np.asarray(img, dtype=np.uint8)).strip()
