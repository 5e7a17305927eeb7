"""Plot sinks (SURVEY §2.8, op L7) — deterministic PNG charts with zero
plotting dependencies.

Reference analogs: the line / identity-scatter / trend-scatter /
similarity-heatmap plots (/root/reference/src/shared/plotting.py:5-76)
and the forest statistics panels
(/root/reference/src/shared/forest_insights.py:190-275).

The container has no matplotlib, so the raster path is a from-scratch
stdlib PNG writer (zlib + struct, RGB8, filter 0 scanlines). The split is
Spark-first: anything derived from a DataFrame is aggregated DISTRIBUTED
down to ≤ ``bins`` rows (one min/max agg + one floor-bucket groupBy)
before the driver rasterizes — a 10^12-row column histograms with two
shuffles and a ≤bins-row collect, and driver memory is O(width × height)
regardless of data size. The heatmap is an eval-scale sink like the
reference's (a q×m pixel grid cannot meaningfully exceed screen size) and
enforces ``max_side``.

Determinism: fixed zlib level, no timestamp/tEXt chunks, stable bin
edges → byte-identical PNGs for identical inputs (tested in
tests/test_plot_sinks.py).
"""

from __future__ import annotations

import struct
import zlib
from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WHITE = (255, 255, 255)
BLACK = (0, 0, 0)
GRID = (220, 220, 220)
BLUE = (31, 73, 212)
RED = (214, 39, 40)
LIGHTGREEN = (144, 238, 144)
SALMON = (250, 128, 114)
PURPLE = (147, 112, 219)

# 3x5 bitmaps for numeric axis labels (no font rasterizer in stdlib).
_FONT = {
    "0": ("111", "101", "101", "101", "111"),
    "1": ("010", "110", "010", "010", "111"),
    "2": ("111", "001", "111", "100", "111"),
    "3": ("111", "001", "111", "001", "111"),
    "4": ("101", "101", "111", "001", "001"),
    "5": ("111", "100", "111", "001", "111"),
    "6": ("111", "100", "111", "101", "111"),
    "7": ("111", "001", "010", "010", "010"),
    "8": ("111", "101", "111", "101", "111"),
    "9": ("111", "101", "111", "001", "111"),
    "-": ("000", "000", "111", "000", "000"),
    "_": ("000", "000", "000", "000", "111"),
    ".": ("000", "000", "000", "000", "010"),
    "e": ("000", "111", "111", "100", "111"),
    "+": ("000", "010", "111", "010", "000"),
    "x": ("000", "101", "010", "101", "000"),
    " ": ("000", "000", "000", "000", "000"),
    # minimal lowercase set so legends can carry words ("ideal",
    # "measured", "valid") rather than cryptic codes
    "a": ("111", "101", "111", "101", "101"),
    "b": ("110", "101", "110", "101", "110"),
    "c": ("111", "100", "100", "100", "111"),
    "d": ("110", "101", "101", "101", "110"),
    "f": ("111", "100", "110", "100", "100"),
    "g": ("111", "100", "101", "101", "111"),
    "h": ("101", "101", "111", "101", "101"),
    "i": ("111", "010", "010", "010", "111"),
    "j": ("001", "001", "001", "101", "111"),
    "k": ("101", "110", "100", "110", "101"),
    "l": ("100", "100", "100", "100", "111"),
    "m": ("101", "111", "111", "101", "101"),
    "n": ("110", "101", "101", "101", "101"),
    "o": ("111", "101", "101", "101", "111"),
    "p": ("111", "101", "111", "100", "100"),
    "q": ("111", "101", "101", "111", "001"),
    "r": ("111", "101", "110", "101", "101"),
    "s": ("111", "100", "111", "001", "111"),
    "t": ("111", "010", "010", "010", "010"),
    "u": ("101", "101", "101", "101", "111"),
    "v": ("101", "101", "101", "101", "010"),
    "w": ("101", "101", "111", "111", "101"),
    "y": ("101", "101", "010", "010", "010"),
    "z": ("111", "001", "010", "100", "111"),
    "/": ("001", "001", "010", "100", "100"),
}


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    body = tag + data
    return struct.pack(">I", len(data)) + body + struct.pack(
        ">I", zlib.crc32(body) & 0xFFFFFFFF
    )


def png_encode(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal RGB8 PNG: IHDR + one zlib IDAT (filter 0 per scanline) + IEND.
    Fixed compression level and no ancillary chunks keep output
    byte-deterministic."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} bytes, got {len(rgb)}")
    raw = bytearray()
    stride = width * 3
    for y in range(height):
        raw.append(0)  # filter type 0 (None)
        raw += rgb[y * stride : (y + 1) * stride]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + _png_chunk(b"IEND", b"")
    )


class Canvas:
    """Tiny driver-side rasterizer: rects, Bresenham lines (optionally
    dashed), square markers, 3x5 digit labels."""

    def __init__(self, width: int, height: int, bg=WHITE):
        self.w, self.h = int(width), int(height)
        self.buf = bytearray(bytes(bg) * (self.w * self.h))

    def set(self, x: int, y: int, color) -> None:
        if 0 <= x < self.w and 0 <= y < self.h:
            i = (y * self.w + x) * 3
            self.buf[i : i + 3] = bytes(color)

    def fill_rect(self, x0: int, y0: int, x1: int, y1: int, color) -> None:
        x0, x1 = max(0, min(x0, x1)), min(self.w - 1, max(x0, x1))
        y0, y1 = max(0, min(y0, y1)), min(self.h - 1, max(y0, y1))
        row = bytes(color) * (x1 - x0 + 1)
        for y in range(y0, y1 + 1):
            i = (y * self.w + x0) * 3
            self.buf[i : i + len(row)] = row

    def line(self, x0: int, y0: int, x1: int, y1: int, color, dash: int = 0) -> None:
        dx, dy = abs(x1 - x0), -abs(y1 - y0)
        sx, sy = (1 if x0 < x1 else -1), (1 if y0 < y1 else -1)
        err, step = dx + dy, 0
        while True:
            if dash == 0 or (step // dash) % 2 == 0:
                self.set(x0, y0, color)
            if x0 == x1 and y0 == y1:
                break
            e2 = 2 * err
            if e2 >= dy:
                err += dy
                x0 += sx
            if e2 <= dx:
                err += dx
                y0 += sy
            step += 1

    def marker(self, x: int, y: int, color, size: int = 2) -> None:
        self.fill_rect(x - size, y - size, x + size, y + size, color)

    def text(self, x: int, y: int, s: str, color=BLACK) -> None:
        for ch in s:
            # case-fold unknown chars so uppercase labels render via the
            # lowercase glyphs instead of vanishing into blanks
            glyph = _FONT.get(ch) or _FONT.get(ch.lower(), _FONT[" "])
            for r, rowbits in enumerate(glyph):
                for c, bit in enumerate(rowbits):
                    if bit == "1":
                        self.set(x + c, y + r, color)
            x += 4

    def to_png(self) -> bytes:
        return png_encode(self.w, self.h, bytes(self.buf))

    def save(self, path: str) -> str:
        with open(path, "wb") as f:
            f.write(self.to_png())
        return path


def _fmt(v: float) -> str:
    s = "%g" % (round(float(v), 6) + 0.0)  # +0.0 folds -0.0
    return s


class _Axes:
    """Plot frame + data→pixel transform + min/max tick labels."""

    def __init__(self, cv: Canvas, x0, x1, y0, y1, *, ml=30, mr=10, mt=10, mb=14,
                 ox=0, oy=0, pw=None, ph=None):
        self.cv = cv
        self.px0, self.py0 = ox + ml, oy + mt
        self.px1 = ox + (pw if pw is not None else cv.w) - mr - 1
        self.py1 = oy + (ph if ph is not None else cv.h) - mb - 1
        self.x0, self.x1 = float(x0), float(x1)
        self.y0, self.y1 = float(y0), float(y1)
        if self.x1 <= self.x0:
            self.x1 = self.x0 + 1.0
        if self.y1 <= self.y0:
            self.y1 = self.y0 + 1.0
        # frame + light grid (the reference's grid(True))
        for g in range(1, 4):
            gx = self.px0 + (self.px1 - self.px0) * g // 4
            gy = self.py0 + (self.py1 - self.py0) * g // 4
            cv.line(gx, self.py0, gx, self.py1, GRID)
            cv.line(self.px0, gy, self.px1, gy, GRID)
        cv.line(self.px0, self.py0, self.px0, self.py1, BLACK)
        cv.line(self.px0, self.py1, self.px1, self.py1, BLACK)
        cv.text(self.px0 + 1, self.py1 + 3, _fmt(self.x0))
        lbl = _fmt(self.x1)
        cv.text(self.px1 - 4 * len(lbl), self.py1 + 3, lbl)
        cv.text(max(0, self.px0 - 4 * len(_fmt(self.y1)) - 2), self.py0, _fmt(self.y1))
        cv.text(max(0, self.px0 - 4 * len(_fmt(self.y0)) - 2), self.py1 - 5, _fmt(self.y0))

    def px(self, x: float) -> int:
        return self.px0 + round((float(x) - self.x0) / (self.x1 - self.x0)
                                * (self.px1 - self.px0))

    def py(self, y: float) -> int:
        return self.py1 - round((float(y) - self.y0) / (self.y1 - self.y0)
                                * (self.py1 - self.py0))


def _clean_xy(x: Sequence[float], y: Sequence[float], what: str = "x and y"
              ) -> tuple[list, list]:
    """Shared input guard for the driver-side plots: equal lengths,
    non-empty (len(), not truthiness — numpy arrays are valid inputs and
    have no scalar truth value), and non-finite pairs dropped (one NaN in
    a bench record must not abort the whole chart bundle with an opaque
    'cannot convert float NaN to integer' from the rasterizer)."""
    import math

    if len(x) != len(y) or len(x) == 0:
        raise ValueError(f"{what} must be equal-length and non-empty")
    pairs = [(float(a), float(b)) for a, b in zip(x, y)
             if math.isfinite(a) and math.isfinite(b)]
    if not pairs:
        raise ValueError(f"{what}: no finite points to plot")
    return [a for a, _ in pairs], [b for _, b in pairs]


def line_png(path: str, x: Sequence[float], y: Sequence[float],
             width: int = 640, height: int = 480, color=BLUE) -> str:
    """Marker line plot — the reference's ``plot`` (plotting.py:5-12).
    Non-finite points are dropped."""
    x, y = _clean_xy(x, y)
    cv = Canvas(width, height)
    ax = _Axes(cv, min(x), max(x), min(y), max(y))
    pts = [(ax.px(a), ax.py(b)) for a, b in zip(x, y)]
    for (a0, b0), (a1, b1) in zip(pts, pts[1:]):
        cv.line(a0, b0, a1, b1, color)
    for a, b in pts:
        cv.marker(a, b, color)
    return cv.save(path)


SERIES_COLORS = (BLUE, RED, (34, 139, 34), PURPLE, (255, 140, 0), BLACK)


def multi_line_png(path: str, series: dict, width: int = 640,
                   height: int = 480) -> str:
    """Overlaid marker line plots with a legend — the summary panels of
    the reference's experiment sweep overlay one series per config
    (test_forest_vote.py:464-502, hue=popularity). ``series`` maps a
    label (digits / lowercase / x / - / . , e.g. "16x8", "ideal") to an
    (xs, ys) pair;
    colors cycle through ``SERIES_COLORS`` in insertion order. Each
    series is drawn in ASCENDING-X order regardless of input order (the
    sweep-overlay convention — a deliberate difference from line_png,
    which connects points in input order); non-finite points are
    dropped."""
    if not series:
        raise ValueError("series must be non-empty")
    series = {
        label: _clean_xy(xs, ys, what=f"series {label!r}")
        for label, (xs, ys) in series.items()
    }
    all_x = [v for xs, _ in series.values() for v in xs]
    all_y = [v for _, ys in series.values() for v in ys]
    cv = Canvas(width, height)
    ax = _Axes(cv, min(all_x), max(all_x), min(all_y), max(all_y))
    for i, (label, (xs, ys)) in enumerate(series.items()):
        color = SERIES_COLORS[i % len(SERIES_COLORS)]
        pts = sorted((ax.px(a), ax.py(b)) for a, b in zip(xs, ys))
        for (a0, b0), (a1, b1) in zip(pts, pts[1:]):
            cv.line(a0, b0, a1, b1, color)
        for a, b in pts:
            cv.marker(a, b, color)
        # legend entry: swatch + label, top-left inside the frame
        ly = ax.py0 + 4 + i * 10
        cv.fill_rect(ax.px0 + 4, ly + 1, ax.px0 + 10, ly + 4, color)
        cv.text(ax.px0 + 14, ly, str(label), color)
    return cv.save(path)


def hbar_png(path: str, items: dict, width: int = 640,
             height: int = 480, color=BLUE) -> str:
    """Horizontal bar chart — labeled categories (e.g. per-query bench
    seconds), the reference's summary bar panels. ``items`` maps label →
    non-negative value; bars render in insertion order, value printed at
    each bar's end."""
    if not items:
        raise ValueError("items must be non-empty")
    vals = [float(v) for v in items.values()]
    if min(vals) < 0:
        raise ValueError("hbar values must be non-negative")
    cv = Canvas(width, height)
    label_w = 4 * max(len(str(k)) for k in items) + 6
    ml = min(label_w, width // 2)
    ax = _Axes(cv, 0.0, max(vals), 0.0, float(len(items)), ml=ml)
    band = (ax.py1 - ax.py0) / len(items)
    # below ~7px per bar the 2px gaps would invert the band (fill_rect's
    # min/max swap then paints over neighbors) and the 5px glyphs
    # overprint: shrink the gap and drop the text, keep the bars
    gap = 2 if band >= 7 else 0
    draw_text = band >= 7
    for i, (label, v) in enumerate(items.items()):
        y0 = ax.py0 + round(i * band) + gap
        y1 = max(y0, ax.py0 + round((i + 1) * band) - gap)
        x1 = ax.px(float(v))
        cv.fill_rect(ax.px0 + 1, y0, max(ax.px0 + 1, x1), y1, color)
        if draw_text:
            ty = (y0 + y1) // 2 - 2
            cv.text(max(0, ax.px0 - 4 * len(str(label)) - 2), ty, str(label))
            cv.text(min(x1 + 3, cv.w - 4 * len(_fmt(v))), ty, _fmt(v))
    return cv.save(path)


def scatter_identity_png(path: str, x: Sequence[float], y: Sequence[float],
                         width: int = 640, height: int = 480) -> str:
    """Scatter + dashed red y=x — ``plot_with_identity_line``
    (plotting.py:14-32). Non-finite points are dropped."""
    x, y = _clean_xy(x, y)
    lo, hi = min(min(x), min(y)), max(max(x), max(y))
    cv = Canvas(width, height)
    ax = _Axes(cv, lo, hi, lo, hi)
    cv.line(ax.px(lo), ax.py(lo), ax.px(hi), ax.py(hi), RED, dash=4)
    for a, b in zip(x, y):
        cv.marker(ax.px(a), ax.py(b), BLUE)
    return cv.save(path)


def scatter_trend_png(path: str, x: Sequence[float], y: Sequence[float],
                      deg: int = 1, width: int = 640, height: int = 480) -> str:
    """Scatter + dashed least-squares trend — ``plot_with_trendline``
    (plotting.py:34-51). Non-finite points are dropped."""
    if len(x) != len(y):
        raise ValueError("x and y must be equal-length")
    x, y = _clean_xy(x, y)
    if len(x) <= deg:
        raise ValueError("need more finite points than the polynomial degree")
    xs, ys = np.asarray(x, dtype=float), np.asarray(y, dtype=float)
    coeffs = np.polyfit(xs, ys, deg=deg)
    grid = np.linspace(xs.min(), xs.max(), 200)
    fit = np.polyval(coeffs, grid)
    cv = Canvas(width, height)
    ax = _Axes(cv, xs.min(), xs.max(),
               min(ys.min(), fit.min()), max(ys.max(), fit.max()))
    pts = [(ax.px(a), ax.py(b)) for a, b in zip(grid, fit)]
    for (a0, b0), (a1, b1) in zip(pts, pts[1:]):
        cv.line(a0, b0, a1, b1, BLACK, dash=3)
    for a, b in zip(xs, ys):
        cv.marker(ax.px(a), ax.py(b), BLUE)
    return cv.save(path)


def _bwr(t: float) -> tuple:
    """Diverging blue-white-red map on [-1, 1] (the reference's ``bwr``)."""
    t = max(-1.0, min(1.0, t))
    if t < 0:
        f = 1.0 + t
        return (round(255 * f), round(255 * f), 255)
    f = 1.0 - t
    return (255, round(255 * f), round(255 * f))


def similarity_heatmap_png(path: str, query_vecs, doc_vecs, gamma: float = 2.0,
                           cell: int = 8, max_side: int = 512) -> str:
    """Power-law cosine heatmap — ``plot_similarity_heatmap``
    (plotting.py:53-76). Eval-scale by construction (a q×m pixel grid);
    ``max_side`` guards against accidentally passing a corpus."""
    q = np.asarray(query_vecs, dtype=float)
    d = np.asarray(doc_vecs, dtype=float)
    if q.ndim != 2 or d.ndim != 2 or q.shape[1] != d.shape[1]:
        raise ValueError("query_vecs and doc_vecs must be 2-D with equal dim")
    if q.shape[0] > max_side or d.shape[0] > max_side:
        raise ValueError(
            f"heatmap sides capped at {max_side} (got {q.shape[0]}x{d.shape[0]}); "
            "aggregate or sample first — this is an eval-scale sink"
        )
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    dn = d / np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-12)
    sim = qn @ dn.T
    transformed = np.sign(sim) * (np.abs(sim) ** gamma)
    cv = Canvas(d.shape[0] * cell, q.shape[0] * cell)
    for i in range(q.shape[0]):
        for j in range(d.shape[0]):
            cv.fill_rect(j * cell, i * cell, (j + 1) * cell - 1,
                         (i + 1) * cell - 1, _bwr(transformed[i, j]))
    return cv.save(path)


def histogram_bins(df: DataFrame, col: str, bins: int = 30,
                   weight_col: str | None = None) -> list:
    """Distributed fixed-width binning: one min/max agg + one floor-bucket
    groupBy; returns ≤ ``bins`` rows of (bin_lo, bin_hi, count) to the
    driver. Nulls AND NaN are dropped (NaN is not null in Spark and
    sorts above every value — one 0/0 ratio would otherwise poison the
    max and yield NaN bin edges). Weighted counts are rounded, not
    floored. A constant column degenerates to one bin. Runs two actions
    over ``df`` — pass a persisted DataFrame when the input is itself an
    expensive aggregate."""
    if bins < 1:
        raise ValueError("bins must be >= 1")
    c = F.col(col).cast("double")
    vals = df.where(c.isNotNull() & ~F.isnan(c))
    ext = vals.agg(F.min(c).alias("lo"), F.max(c).alias("hi")).first()
    if ext is None or ext["lo"] is None:
        return []
    lo, hi = float(ext["lo"]), float(ext["hi"])
    w = F.lit(1) if weight_col is None else F.col(weight_col)
    if hi <= lo:
        n = vals.agg(F.sum(w).alias("n")).first()["n"]
        return [(lo, lo, int(round(n or 0)))]
    width = (hi - lo) / bins
    bin_expr = F.least(
        F.floor((c - F.lit(lo)) / F.lit(width)).cast("int"), F.lit(bins - 1)
    ).alias("bin")
    rows = (
        vals.select(bin_expr, w.alias("w"))
        .groupBy("bin")
        .agg(F.sum("w").alias("n"))
        .orderBy("bin")
        .collect()
    )
    return [
        (lo + r["bin"] * width, lo + (r["bin"] + 1) * width,
         int(round(r["n"] or 0)))
        for r in rows
    ]


def _render_hist(cv: Canvas, binrows: list, color, *, ox=0, oy=0,
                 pw=None, ph=None) -> None:
    if not binrows:
        raise ValueError("no data to histogram")
    top = max(n for _, _, n in binrows)
    ax = _Axes(cv, binrows[0][0], binrows[-1][1], 0, top,
               ox=ox, oy=oy, pw=pw, ph=ph)
    for blo, bhi, n in binrows:
        x0, x1 = ax.px(blo), ax.px(bhi)
        y = ax.py(n)
        if x1 > x0 + 1:
            cv.fill_rect(x0 + 1, y, x1 - 1, ax.py1 - 1, color)
        cv.line(x0, y, x1, y, BLACK)
        cv.line(x0, y, x0, ax.py1, BLACK)
        cv.line(x1, y, x1, ax.py1, BLACK)


def histogram_png(df: DataFrame, col: str, path: str, bins: int = 30,
                  width: int = 640, height: int = 480, color=LIGHTGREEN,
                  weight_col: str | None = None) -> str:
    """Histogram sink over a DataFrame column — the reference's
    ``ax1.hist(...)`` / trial-attempts histogram
    (forest_insights.py:229-233, :267-275), binned in Spark."""
    cv = Canvas(width, height)
    _render_hist(cv, histogram_bins(df, col, bins, weight_col), color)
    return cv.save(path)


def cluster_size_histogram_png(assignments: DataFrame, path: str,
                               bins: int = 30, cluster_col: str = "cluster_id",
                               width: int = 640, height: int = 480) -> str:
    """Flagship-pipeline sink: histogram of dedup cluster sizes. Two
    distributed aggs (groupBy cluster → count, then binning); the driver
    only ever sees ≤ ``bins`` rows."""
    sizes = assignments.groupBy(cluster_col).agg(
        F.count("*").alias("cluster_n")
    ).persist()  # feeds histogram_bins' two actions — shuffle once
    try:
        cv = Canvas(width, height)
        _render_hist(cv, histogram_bins(sizes, "cluster_n", bins), LIGHTGREEN)
        return cv.save(path)
    finally:
        sizes.unpersist()


def dedup_report_pngs(out_dir: str, *, clusters: DataFrame | None = None,
                      verified: DataFrame | None = None,
                      bands: DataFrame | None = None,
                      run=None, bins: int = 30) -> dict:
    """Diagnostic chart bundle for a dedup pipeline run — the reference's
    ``save=True`` plot sinks (forest_insights.py:262-275) over the
    engine's checkpointed stage outputs. Accepts a
    ``plans.pipeline.PipelineRun`` (duck-typed: anything with
    ``.outputs``) and/or explicit DataFrames; writes whichever charts its
    inputs allow and returns ``{chart_name: path}``. Every chart
    aggregates distributed before a ≤bins-row collect, so this is safe to
    call after a web-scale run."""
    import os

    if run is not None:
        outs = run.outputs
        clusters = clusters if clusters is not None else outs.get("clusters")
        verified = verified if verified is not None else outs.get("verified")
        bands = bands if bands is not None else outs.get("bands")
    os.makedirs(out_dir, exist_ok=True)
    written = {}
    if clusters is not None:
        written["cluster_sizes"] = cluster_size_histogram_png(
            clusters, os.path.join(out_dir, "cluster_sizes.png"), bins
        )
    if verified is not None:
        written["jaccard_hist"] = histogram_png(
            verified, "jaccard", os.path.join(out_dir, "jaccard_hist.png"), bins
        )
    if bands is not None:
        if "depth" in bands.columns:
            written["forest_stats"] = forest_statistics_png(
                bands, os.path.join(out_dir, "forest_stats.png"), bins
            )
        else:  # fixed-depth band table: bucket-size distribution only
            buckets = bands.groupBy("band_id", "band_hash").agg(
                F.count("*").alias("bucket_n")
            )
            written["bucket_sizes"] = histogram_png(
                buckets, "bucket_n", os.path.join(out_dir, "bucket_sizes.png"), bins
            )
    return written


def forest_statistics_png(bands: DataFrame, path: str, bins: int = 30,
                          width: int = 900, height: int = 640) -> str:
    """2×2 forest statistics panel — ``plot_statistics``
    (forest_insights.py:190-262) over the materialized band tables:
    (1) bucket-size distribution, (2) buckets per depth, (3) average
    bucket size by depth, (4) docs per depth. One distributed pass builds
    a per-bucket table (persisted — it feeds the per-depth collect AND
    histogram_bins' two actions; without the persist the full band-table
    groupBy would re-shuffle three times); every panel renders from
    ≤ ``bins``-row collects."""
    buckets = bands.groupBy("band_id", "depth", "band_hash").agg(
        F.count("*").alias("bucket_n")
    ).persist()
    per_depth = (
        buckets.groupBy("depth")
        .agg(
            F.count("*").alias("num_buckets"),
            F.avg("bucket_n").alias("avg_bucket_n"),
            F.sum("bucket_n").alias("docs"),
        )
        .orderBy("depth")
        .collect()
    )
    if not per_depth:
        buckets.unpersist()
        raise ValueError("empty band table")
    cv = Canvas(width, height)
    hw, hh = width // 2, height // 2
    # (1) bucket-size distribution (hist, distributed binning)
    try:
        binrows = histogram_bins(buckets, "bucket_n", bins)
    finally:
        buckets.unpersist()  # last buckets action — the rest is per_depth
    _render_hist(cv, binrows, LIGHTGREEN, ox=0, oy=0, pw=hw, ph=hh)
    # (2) buckets per depth (bar)
    depths = [r["depth"] for r in per_depth]
    nb = [r["num_buckets"] for r in per_depth]
    ax2 = _Axes(cv, min(depths), max(depths), 0, max(nb), ox=hw, oy=0, pw=hw, ph=hh)
    bw = max(2, (ax2.px1 - ax2.px0) // (2 * max(1, len(depths))))
    for d, n in zip(depths, nb):
        x = ax2.px(d)
        cv.fill_rect(x - bw // 2, ax2.py(n), x + bw // 2, ax2.py1 - 1, SALMON)
    # (3) average bucket size by depth (line, 'o-' blue)
    avg = [float(r["avg_bucket_n"]) for r in per_depth]
    ax3 = _Axes(cv, min(depths), max(depths), 0, max(avg), ox=0, oy=hh, pw=hw, ph=hh)
    pts = [(ax3.px(d), ax3.py(v)) for d, v in zip(depths, avg)]
    for (a0, b0), (a1, b1) in zip(pts, pts[1:]):
        cv.line(a0, b0, a1, b1, BLUE)
    for a, b in pts:
        cv.marker(a, b, BLUE)
    # (4) docs per depth (line, 'd-' purple)
    docs = [r["docs"] for r in per_depth]
    ax4 = _Axes(cv, min(depths), max(depths), 0, max(docs), ox=hw, oy=hh, pw=hw, ph=hh)
    pts = [(ax4.px(d), ax4.py(v)) for d, v in zip(depths, docs)]
    for (a0, b0), (a1, b1) in zip(pts, pts[1:]):
        cv.line(a0, b0, a1, b1, PURPLE)
    for a, b in pts:
        cv.marker(a, b, PURPLE)
    return cv.save(path)
