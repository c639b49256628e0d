import json
import numpy as np

from tpusfm.io import reports


def test_adjacency_svg_and_stats(tmp_path):
    pairs = np.asarray([[0, 1], [1, 2], [2, 3]], np.int32)
    counts = np.asarray([10, 0, 5])
    svg = tmp_path / "adj.svg"
    reports.write_adjacency_svg(svg, 4, pairs, counts)
    text = svg.read_text()
    assert "<svg" in text and text.count("<rect") >= 4  # bg + 2 sym cells x2
    stats = reports.graph_stats(4, pairs, counts)
    assert stats["n_edges"] == 2
    assert stats["n_components"] == 2  # {0,1} and {2,3}; view with count 0 drops edge 1-2
    reports.write_graphviz(tmp_path / "g.dot", pairs, counts)
    assert "v0 -- v1" in (tmp_path / "g.dot").read_text()


def test_html_report(tmp_path):
    svg = tmp_path / "m.svg"
    svg.write_text("<svg xmlns='http://www.w3.org/2000/svg'></svg>")
    out = tmp_path / "report.html"
    reports.write_html_report(out, {"n_views": 5, "times": {"a": 1.0}}, [str(svg)])
    text = out.read_text()
    assert "n_views" in text and "<svg" in text and "times" in text
