"""Retained TextGrid widget + the editor log panel
(reference render/sakura/components/retained/text_grid.hh:17-92)."""

import json
import time
import urllib.request

import pytest

from cyberether_tpu.remote.textgrid import TextGrid, TextGridConfig


def test_wrap_modes_and_metrics():
    g = TextGrid(value="alpha beta gamma delta", wrap="word",
                 font_size=10.0)
    rows = g.render_rows(width_cols=11)
    texts = [r["html"] for r in rows]
    assert texts == ["alpha beta", "gamma delta"]
    assert rows[0]["line"] == 0 and rows[1]["line"] == -1

    g.config.wrap = "character"
    rows = g.render_rows(width_cols=8)
    assert all(len(r["html"]) <= 8 for r in rows)
    assert "".join(r["html"] for r in rows) == g.config.value

    g.config.wrap = "none"
    assert len(g.render_rows(width_cols=5)) == 1

    # metrics: two source lines, the second wrapping into 2 rows
    g2 = TextGrid(value="short\n" + "x" * 20, wrap="character",
                  font_size=10.0)
    m = g2.metrics(width_cols=10)
    lh = 10.0 * 1.4
    assert m["sourceLines"][0] == {"top": 0.0, "height": lh}
    assert m["sourceLines"][1]["top"] == lh
    assert m["sourceLines"][1]["height"] == 2 * lh
    assert m["contentHeight"] == 3 * lh


def test_word_wrap_no_space_hard_breaks():
    g = TextGrid(value="abcdefghij", wrap="word")
    rows = g.render_rows(width_cols=4)
    assert [r["html"] for r in rows] == ["abcd", "efgh", "ij"]


def test_styled_spans_and_escaping():
    g = TextGrid(value="a <b> c\nplain",
                 style_color_keys=["err", "warn"])
    g.set_line_styles(0, [(2, 5, 0)])
    html = g.render_html()
    assert '<span class="tg-err">&lt;b&gt;</span>' in html
    assert "plain" in html
    # spans clip to wrapped segments
    g2 = TextGrid(value="0123456789", wrap="character",
                  style_color_keys=["hot"])
    g2.set_line_styles(0, [(3, 7, 0)])
    rows = g2.render_rows(width_cols=5)
    assert rows[0]["html"].endswith('<span class="tg-hot">34</span>')
    assert rows[1]["html"].startswith('<span class="tg-hot">56</span>')


def test_line_numbers_active_line_and_flags():
    g = TextGrid(value="one\ntwo\nthree", line_numbers=True,
                 stick_to_bottom=True, editable=True)
    g.active_line = 1
    html = g.render_html()
    assert 'data-stick="1"' in html and 'data-editable="1"' in html
    assert '<span class="tg-num"' in html and ">2</span>" in html
    assert html.count("tg-active") == 1
    # per-line scale and indent land as inline styles
    g.config.line_scale = [1.0, 2.0, 1.0]
    g.config.line_indent = [0.0, 0.0, 4.0]
    html = g.render_html()
    assert "font-size:30px" in html       # 15 * 2.0
    assert "padding-left:4ch" in html


def test_append_line_with_spans():
    g = TextGrid(style_color_keys=["err"])
    g.append_line("first")
    g.append_line("E boom", spans=[(0, 1, 0)])
    assert g.lines == ["first", "E boom"]
    assert '<span class="tg-err">E</span>' in g.render_html()


def test_append_multiline_record_spans_first_physical_line():
    """A record containing embedded newlines (tracebacks) becomes
    several physical lines; the caller's spans were computed against
    the record's start and must land on its FIRST physical line
    (review finding)."""
    g = TextGrid(style_color_keys=["err"])
    g.append_line("ok line")
    g.append_line("E boom\n  File x.py line 3", spans=[(0, 1, 0)])
    rows = g.render_rows()
    assert rows[1]["html"].startswith('<span class="tg-err">E</span>')
    assert "File x.py" in rows[2]["html"]
    assert "tg-err" not in rows[2]["html"]


PORT = 8899          # 8893 belongs to test_highlight's server


def test_logs_endpoint_textgrid():
    from cyberether_tpu.core.instance import Instance
    from cyberether_tpu.remote.server import RemoteServer
    from cyberether_tpu.utils.logging import get_logger

    get_logger("test.panel").warning("grid warning %d", 42)
    get_logger("test.panel").error("grid error")

    inst = Instance(headless=True)
    srv = RemoteServer(inst, port=PORT)
    srv.start()
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{PORT}/", timeout=1)
            break
        except Exception:
            time.sleep(0.1)
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{PORT}/api/v1/logs?n=50",
                timeout=5) as r:
            body = json.loads(r.read())
    finally:
        srv.stop()
        inst.stop()
    assert body["count"] >= 2
    assert "grid warning 42" in body["html"]
    assert "tg-warn" in body["html"] and "tg-err" in body["html"]
    assert 'class="tg-num"' in body["html"]
    assert body["metrics"]["stickToBottom"] is True
    assert body["metrics"]["contentHeight"] > 0
