"""H9 chart transforms (experiments/charts.py): the SVG renderings of the
estimation-error artifacts must carry the reference figure's structure
(panel grid, 6 series per sketch panel / 2 per token panel, solid-vs-
dotted estimator split), be byte-deterministic, and track the data
(rmse curves hug the theory lines mid-ladder)."""

import math
import os
import xml.etree.ElementTree as ET

import pytest

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts")
NS = "{http://www.w3.org/2000/svg}"


def _pts(poly):
    return [tuple(map(float, p.split(","))) for p in poly.get("points").split()]


@pytest.fixture(scope="module")
def sketch_svg(tmp_path_factory):
    from exaloglog_paper_spark.experiments.charts import render_estimation_error_grid

    out = str(tmp_path_factory.mktemp("charts") / "est.svg")
    render_estimation_error_grid(ART, out)
    return out


def test_sketch_grid_structure(sketch_svg):
    root = ET.parse(sketch_svg).getroot()
    polys = root.findall(f"{NS}polyline")
    by_cls = {}
    for p in polys:
        by_cls.setdefault(p.get("class"), []).append(p)
    # 16 panels x (2 theory + 2 rmse + 2 bias), reference series set
    assert len(by_cls["theory"]) == 32
    assert len(by_cls["rmse"]) == 32
    assert len(by_cls["bias"]) == 32
    # solid=ML / dotted=martingale split: half of each class is dashed
    for cls in ("theory", "rmse", "bias"):
        dashed = sum(1 for p in by_cls[cls] if p.get("stroke-dasharray"))
        assert dashed == 16, cls
    for p in polys:
        xs = [x for x, _ in _pts(p)]
        assert xs == sorted(xs)  # log-x mapping is monotonic
        assert all(math.isfinite(x) for x in xs)
    for p in by_cls["theory"]:
        assert len({y for _, y in _pts(p)}) == 1  # theory lines horizontal


def test_sketch_chart_tracks_data(sketch_svg):
    """Mid-chart, each panel's solid rmse curve must hug its solid theory
    line (the artifacts' rmse/RSE ratio ~1 translated to pixel space)."""
    root = ET.parse(sketch_svg).getroot()
    polys = root.findall(f"{NS}polyline")
    theory = [p for p in polys if p.get("class") == "theory" and not p.get("stroke-dasharray")]
    rmse = [p for p in polys if p.get("class") == "rmse" and not p.get("stroke-dasharray")]
    assert len(theory) == len(rmse) == 16

    def panel_of(p):
        pts = _pts(p)
        ymean = sum(y for _, y in pts) / len(pts)
        return (round((pts[0][0] - 52.0) / 266.0), int((ymean - 18.0) // 150.0))

    rmse_by_panel = {panel_of(p): p for p in rmse}
    for th in theory:
        tpts = _pts(th)
        x0, x1 = tpts[0][0], tpts[-1][0]
        ty = tpts[0][1]
        panel_rmse = rmse_by_panel[panel_of(th)]
        mid = [(x, y) for x, y in _pts(panel_rmse) if x0 + 0.55 * (x1 - x0) < x < x0 + 0.75 * (x1 - x0)]
        assert mid, "no rmse points mid-panel"
        # theory sits at y(theo), panel spans 1.45*theo: 10% of panel height
        # ~= 0.145*theo of slack — generous but catches axis/scale bugs
        for _, y in mid:
            assert abs(y - ty) < 12.0, (y, ty)


def test_token_grid_structure_and_determinism(tmp_path):
    from exaloglog_paper_spark.experiments.charts import render_token_error_grid

    a = str(tmp_path / "a.svg")
    b = str(tmp_path / "b.svg")
    render_token_error_grid(ART, a)
    render_token_error_grid(ART, b)
    assert open(a, "rb").read() == open(b, "rb").read()  # byte-deterministic
    root = ET.parse(a).getroot()
    polys = root.findall(f"{NS}polyline")
    assert len([p for p in polys if p.get("class") == "rmse"]) == 6
    assert len([p for p in polys if p.get("class") == "bias"]) == 6


def test_sketch_chart_deterministic(sketch_svg, tmp_path):
    from exaloglog_paper_spark.experiments.charts import render_estimation_error_grid

    again = str(tmp_path / "again.svg")
    render_estimation_error_grid(ART, again)
    assert open(again, "rb").read() == open(sketch_svg, "rb").read()
