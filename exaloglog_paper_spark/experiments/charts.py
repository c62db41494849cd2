"""Chart transforms for the estimation-error artifacts (reference H9).

Re-expresses the reference's matplotlib evaluation charts
(``python/estimation_error_evaluation.py:87-236`` — the 4x4 (t,d) x p
grid with theory/rmse/bias series for both estimators — and
``python/token_estimation_error_evaluation.py:69-150`` — the 3x2 token-v
grid) as deterministic, dependency-free SVG generated straight from the
``artifacts/*.csv`` files. This sandbox ships no matplotlib, so the
renderer is a small hand-rolled log-x line plotter; series selection,
axis ranges, tick positions, line styles (solid=ML / dotted=martingale),
panel ordering, and the per-panel config label with the state size in
bytes all mirror the reference script's choices.

Output is byte-deterministic (no timestamps, fixed float formatting), so
charts regenerate identically from identical artifacts — pinned by
tests/test_charts.py.
"""

from __future__ import annotations

import math
import os

# matplotlib default color cycle C0/C1/C2 — the reference uses colors[0..2]
_C0, _C1, _C2 = "#1f77b4", "#ff7f0e", "#2ca02c"

_PANEL_W, _PANEL_H = 240.0, 120.0
_MARGIN_L, _MARGIN_T, _GAP_X, _GAP_Y = 52.0, 18.0, 26.0, 30.0


def _read_artifact_csv(path: str):
    """(meta dict, header list, rows as list-of-float-lists); Java Infinity
    spellings become math.inf."""
    with open(path) as f:
        meta = dict(kv.split("=") for kv in f.readline().strip().split("; "))
        header = f.readline().strip().split("; ")
        rows = []
        for ln in f:
            vals = []
            for x in ln.split(";"):
                x = x.strip()
                vals.append(
                    math.inf
                    if x == "Infinity"
                    else (-math.inf if x == "-Infinity" else float(x))
                )
            rows.append(vals)
    return meta, header, rows


class _SvgDoc:
    def __init__(self, width: float, height: float):
        self.w, self.h = width, height
        self.parts: list[str] = []

    def line(self, x1, y1, x2, y2, color="#999", width=0.6, dash=None):
        d = f' stroke-dasharray="{dash}"' if dash else ""
        self.parts.append(
            f'<line x1="{x1:.2f}" y1="{y1:.2f}" x2="{x2:.2f}" y2="{y2:.2f}" '
            f'stroke="{color}" stroke-width="{width}"{d}/>'
        )

    def polyline(self, pts, color, width=1.0, dash=None, cls=""):
        if len(pts) < 2:
            return
        d = f' stroke-dasharray="{dash}"' if dash else ""
        c = f' class="{cls}"' if cls else ""
        coords = " ".join(f"{x:.2f},{y:.2f}" for x, y in pts)
        self.parts.append(
            f'<polyline{c} points="{coords}" fill="none" stroke="{color}" '
            f'stroke-width="{width}"{d}/>'
        )

    def text(self, x, y, s, size=7.5, anchor="start", color="#000"):
        self.parts.append(
            f'<text x="{x:.2f}" y="{y:.2f}" font-size="{size}" '
            f'font-family="sans-serif" text-anchor="{anchor}" '
            f'fill="{color}">{s}</text>'
        )

    def rect(self, x, y, w, h, fill="none", stroke="#000", sw=0.7):
        self.parts.append(
            f'<rect x="{x:.2f}" y="{y:.2f}" width="{w:.2f}" height="{h:.2f}" '
            f'fill="{fill}" stroke="{stroke}" stroke-width="{sw}"/>'
        )

    def render(self) -> str:
        body = "\n".join(self.parts)
        return (
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{self.w:.0f}" '
            f'height="{self.h:.0f}" viewBox="0 0 {self.w:.0f} {self.h:.0f}">\n'
            f'<rect width="100%" height="100%" fill="white"/>\n{body}\n</svg>\n'
        )


class _Panel:
    """One log-x / linear-y axes box."""

    def __init__(self, doc, ox, oy, xmax_log10, ymin, ymax, xtick_step):
        self.doc, self.ox, self.oy = doc, ox, oy
        self.xmax_log10, self.ymin, self.ymax = xmax_log10, ymin, ymax
        doc.rect(ox, oy, _PANEL_W, _PANEL_H)
        for e in range(0, xmax_log10 + 1, xtick_step):
            x = self._x(10.0**e)
            doc.line(x, oy + _PANEL_H, x, oy + _PANEL_H - 3, color="#000")
            doc.text(x, oy + _PANEL_H + 9, _pow10_label(e), size=6, anchor="middle")
        if ymin < 0 < ymax:  # zero line
            doc.line(self.ox, self._y(0), self.ox + _PANEL_W, self._y(0), dash="1,2")
        for v in (ymin, ymax):
            doc.text(ox - 3, self._y(v) + 2, _fmt_pct(v), size=6, anchor="end")

    def _x(self, v: float) -> float:
        return self.ox + _PANEL_W * (math.log10(max(v, 1.0)) / self.xmax_log10)

    def _y(self, v: float) -> float:
        frac = (v - self.ymin) / (self.ymax - self.ymin)
        return self.oy + _PANEL_H * (1.0 - frac)

    def series(self, xs, ys, color, dotted=False, cls=""):
        """Non-finite points are dropped; finite values are clamped to the
        axes box (matplotlib-clip look: the saturation dive rides the
        bottom edge instead of vanishing)."""
        pts = [
            (self._x(x), self._y(min(max(y, self.ymin), self.ymax)))
            for x, y in zip(xs, ys)
            if math.isfinite(y) and x >= 1.0
        ]
        self.doc.polyline(pts, color, dash="1.5,2.5" if dotted else None, cls=cls)

    def label(self, s: str):
        self.doc.rect(self.ox + 4, self.oy + 3, 7.2 * len(s) * 0.62, 11,
                      fill="wheat", stroke="#aa9", sw=0.5)
        self.doc.text(self.ox + 7, self.oy + 11.5, s, size=6.5)


def _pow10_label(e: int) -> str:
    return "1" if e == 0 else ("10" if e == 1 else f"1e{e}")


def _fmt_pct(v: float) -> str:
    return f"{v:.3g}%"


def render_estimation_error_grid(
    artifact_dir: str,
    out_svg: str,
    tdvals=((1, 9), (2, 16), (2, 20), (2, 24)),
    pvals=(4, 6, 8, 10),
) -> str:
    """The reference's 4x4 estimation-error figure: columns = (t,d),
    rows = p; per panel 6 series — ML/martingale theory (green), rmse
    (orange), bias (blue); solid = ML, dotted = martingale — over the
    961-rung ladder to 1e21 (estimation_error_evaluation.py:87-236)."""
    ncol, nrow = len(tdvals), len(pvals)
    doc = _SvgDoc(
        _MARGIN_L + ncol * (_PANEL_W + _GAP_X),
        _MARGIN_T + nrow * (_PANEL_H + _GAP_Y) + 26,
    )
    for ci, (t, d) in enumerate(tdvals):
        for ri, p in enumerate(pvals):
            path = os.path.join(
                artifact_dir, f"estimation-error-t{t:02d}-d{d:02d}-p{p:02d}.csv"
            )
            _, _, rows = _read_artifact_csv(path)
            n = [r[0] for r in rows]
            # column layout: 0 n | 1 bias_ml 2 rmse_ml 3 rse_ml |
            # 4 bias_mart 5 rmse_mart 6 rse_mart (the reference's header)
            theo_ml = 100.0 * rows[0][3]
            theo_mart = 100.0 * rows[0][6]
            ox = _MARGIN_L + ci * (_PANEL_W + _GAP_X)
            oy = _MARGIN_T + ri * (_PANEL_H + _GAP_Y)
            # reference y-window: [-0.1, 1.35] x ML theory (in %)
            pn = _Panel(doc, ox, oy, 21, -theo_ml * 0.1, theo_ml * 1.35, 3)
            pn.series(n, [theo_mart] * len(n), _C2, dotted=True, cls="theory")
            pn.series(n, [theo_ml] * len(n), _C2, cls="theory")
            pn.series(n, [100.0 * r[5] for r in rows], _C1, dotted=True, cls="rmse")
            pn.series(n, [100.0 * r[2] for r in rows], _C1, cls="rmse")
            pn.series(n, [100.0 * r[4] for r in rows], _C0, dotted=True, cls="bias")
            pn.series(n, [100.0 * r[1] for r in rows], _C0, cls="bias")
            nbytes = ((1 << p) * (t + 6 + d) + 7) // 8
            pn.label(f"t={t}, d={d}, p={p} ({nbytes} bytes)")
            if ri == nrow - 1:
                doc.text(ox + _PANEL_W / 2, oy + _PANEL_H + 22,
                         "distinct count n", anchor="middle")
        doc.text(14, _MARGIN_T + _PANEL_H / 2, "relative error (%)", anchor="middle")
    _write(doc, out_svg)
    return out_svg


# per-v y-limit (in %), the reference's own hand-picked list
_TOKEN_YMAX = {6: 12.0, 8: 6.0, 10: 3.0, 12: 1.5, 18: 0.2, 26: 0.01}


def render_token_error_grid(artifact_dir: str, out_svg: str) -> str:
    """The reference's 3x2 token-estimation-error figure: one panel per
    token parameter v, rmse (orange) + bias (blue) over the 206-rung
    ladder to 1e5 (token_estimation_error_evaluation.py:69-150)."""
    order = [(6, 0, 0), (8, 0, 1), (10, 1, 0), (12, 1, 1), (18, 2, 0), (26, 2, 1)]
    doc = _SvgDoc(
        _MARGIN_L + 2 * (_PANEL_W + _GAP_X),
        _MARGIN_T + 3 * (_PANEL_H + _GAP_Y) + 26,
    )
    for v, ri, ci in order:
        path = os.path.join(artifact_dir, f"token-estimation-error-v{v:02d}.csv")
        _, _, rows = _read_artifact_csv(path)
        n = [r[0] for r in rows]
        bias = [100.0 * r[1] for r in rows]
        ymax = _TOKEN_YMAX[v]
        ymin = min(0.0, min(b for b in bias if math.isfinite(b)) * 1.1) - 0.02 * ymax
        ox = _MARGIN_L + ci * (_PANEL_W + _GAP_X)
        oy = _MARGIN_T + ri * (_PANEL_H + _GAP_Y)
        pn = _Panel(doc, ox, oy, 5, ymin, ymax, 1)
        pn.series(n, [100.0 * r[2] for r in rows], _C1, cls="rmse")
        pn.series(n, bias, _C0, cls="bias")
        pn.label(f"v={v} (token size = {6 + v} bits)")
        if ri == 2:
            doc.text(ox + _PANEL_W / 2, oy + _PANEL_H + 22,
                     "distinct count n", anchor="middle")
    doc.text(14, _MARGIN_T + _PANEL_H / 2, "relative error (%)", anchor="middle")
    _write(doc, out_svg)
    return out_svg


def _write(doc: _SvgDoc, out_svg: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(out_svg)), exist_ok=True)
    with open(out_svg, "w") as f:
        f.write(doc.render())
