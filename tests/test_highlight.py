"""Golden tests for the server-side highlighter (VERDICT r3 item 7:
the python tokenizer moved out of the page JS into
remote/highlight.py where string->HTML logic can be pinned)."""

import numpy as np

from cyberether_tpu.remote.highlight import (highlight, md_to_html,
                                             py_highlight)


def test_py_keywords_and_calls():
    got = py_highlight("def foo(x):\n    return x")
    assert '<span class="kw">def</span>' in got
    assert '<span class="fn">foo</span>(' in got
    assert '<span class="kw">return</span>' in got
    assert got.endswith("\n")


def test_py_strings_win_over_keywords():
    got = py_highlight('s = "def not a kw"  # def comment')
    assert '<span class="str">"def not a kw"</span>' in got
    assert '<span class="cmt"># def comment</span>' in got
    # no keyword span INSIDE the string/comment spans
    assert '"<span class="kw">' not in got


def test_py_triple_quoted():
    got = py_highlight('x = """multi\nline\ndef"""')
    assert '<span class="str">"""multi\nline\ndef"""</span>' in got


def test_py_numbers_and_decorators():
    got = py_highlight("@jax.jit\ny = 2.5e-3 + 42")
    assert '<span class="dec">@jax.jit</span>' in got
    assert '<span class="num">2.5e-3</span>' in got
    assert '<span class="num">42</span>' in got
    # attribute-dotted numbers must NOT match (x.0 etc.)
    got2 = py_highlight("a.b0")
    assert "num" not in got2


def test_py_escapes_html():
    got = py_highlight("if a < b & c:")
    assert "&lt;" in got and "&amp;" in got
    assert "<b" not in got.replace('<span class="kw">', "") \
        .replace("</span>", "").replace("&lt;", "")


def test_py_error_line_tint():
    got = py_highlight("a = 1\nb = 2\nc = 3", err_line=2)
    lines = got.split("\n")
    assert lines[1].startswith('<span class="errline">')
    assert lines[0].startswith("a") or "errline" not in lines[0]


def test_py_error_line_out_of_range():
    got = py_highlight("a = 1", err_line=99)
    assert "errline" not in got


def test_golden_snippet_stable():
    """Full-output golden: pins the exact HTML so any tokenizer change
    is a conscious one."""
    src = ('@dec\ndef f(n):  # doc\n'
           '    return "x" + str(n * 1.5)\n')
    want = (
        '<span class="dec">@dec</span>\n'
        '<span class="kw">def</span> <span class="fn">f</span>(n):'
        '  <span class="cmt"># doc</span>\n'
        '    <span class="kw">return</span> '
        '<span class="str">"x"</span> + '
        '<span class="fn">str</span>(n * '
        '<span class="num">1.5</span>)\n\n')
    assert py_highlight(src) == want


def test_md_headers_and_inline():
    got = md_to_html("# Title\n\nsome **bold** and *it* and `code`")
    assert "<h1>Title</h1>" in got
    assert "<b>bold</b>" in got
    assert "<i>it</i>" in got
    assert "<code>code</code>" in got


def test_md_escapes_and_breaks():
    got = md_to_html("a < b\nc & d")
    assert "a &lt; b<br>c &amp; d" in got


def test_highlight_dispatch():
    assert "<h2>" in highlight("## h", kind="md")
    assert "kw" in highlight("import os", kind="py")


def test_highlight_endpoint_roundtrip():
    """The /api/v1/highlight route serves the same renderer."""
    import json
    import time
    import urllib.request

    from cyberether_tpu.core.instance import Instance
    from cyberether_tpu.remote.server import RemoteServer

    inst = Instance(headless=True)
    port = 8893
    server = RemoteServer(inst, port=port, fps=5)
    server.start()
    try:
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline:
            try:
                urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/", timeout=1)
                break
            except Exception:
                time.sleep(0.1)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/highlight",
            data=json.dumps({"code": "def f(): pass",
                             "errLine": 1}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=5) as r:
            body = json.loads(r.read())
        assert body["html"] == py_highlight("def f(): pass", 1)
        assert "errline" in body["html"]
    finally:
        server.stop()
        inst.destroy()


def test_fuzz_no_crash_and_escaped():
    """Any input must produce escaped, crash-free output."""
    rng = np.random.default_rng(0)
    for _ in range(50):
        n = int(rng.integers(0, 200))
        s = "".join(chr(int(c)) for c in rng.integers(32, 127, n))
        out = py_highlight(s, err_line=int(rng.integers(0, 5)))
        assert isinstance(out, str)
        md = md_to_html(s)
        assert isinstance(md, str)
