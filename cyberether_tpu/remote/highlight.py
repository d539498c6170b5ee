"""Server-side syntax highlighting + markdown rendering.

Moved out of the editor's page JS (VERDICT r3 item 7: shrink the
untested JS surface) — pure string -> HTML logic belongs where it can
have golden tests.  The browser now fetches highlighted HTML from
``POST /api/v1/highlight`` and only does DOM glue.

Reference cognates: the embedded tree-sitter grammars behind the code
editor (/root/reference/src/render/sakura/) and the Sakura retained
markdown component.
"""

from __future__ import annotations

import html
import re

_PY_KW = re.compile(
    r"\b(def|class|return|if|elif|else|for|while|import|from|as|"
    r"with|try|except|finally|raise|pass|break|continue|lambda|"
    r"yield|global|nonlocal|assert|del|not|and|or|in|is|None|True|"
    r"False|async|await|self)\b")
_PY_NUM = re.compile(r"(^|[^\w.])(\d+\.?\d*(?:[eE][+-]?\d+)?)")
_PY_DEC = re.compile(r"(@[A-Za-z_][\w.]*)")
_PY_CALL = re.compile(r"([A-Za-z_]\w*)(?=\()")
_PY_TOKENS = re.compile(
    r'("""[\s\S]*?"""|\'\'\'[\s\S]*?\'\'\''
    r'|"(?:\\.|[^"\\\n])*"|\'(?:\\.|[^\'\\\n])*\'|#[^\n]*)')


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;")


def _plain(s: str) -> str:
    s = _esc(s)
    s = _PY_KW.sub(r'<span class="kw">\1</span>', s)
    s = _PY_NUM.sub(r'\1<span class="num">\2</span>', s)
    s = _PY_DEC.sub(r'<span class="dec">\1</span>', s)
    s = _PY_CALL.sub(r'<span class="fn">\1</span>', s)
    return s


def py_highlight(src: str, err_line: int = 0) -> str:
    """Python source -> highlighted HTML (span classes kw/num/dec/fn/
    str/cmt; the 1-based ``err_line`` is wrapped in .errline).
    Strings and comments tokenize first; keyword/number/decorator/call
    passes run over the remaining plain segments."""
    out, last = [], 0
    for m in _PY_TOKENS.finditer(src):
        out.append(_plain(src[last:m.start()]))
        cls = "cmt" if m.group(0).startswith("#") else "str"
        out.append(f'<span class="{cls}">{_esc(m.group(0))}</span>')
        last = m.end()
    out.append(_plain(src[last:]))
    text = "".join(out)
    if err_line > 0:
        lines = text.split("\n")
        if err_line <= len(lines):
            lines[err_line - 1] = ('<span class="errline">'
                                   f'{lines[err_line - 1] or " "}'
                                   "</span>")
        text = "\n".join(lines)
    return text + "\n"


_MD_H = re.compile(r"^(#{1,3})\s+(.*)$", re.M)


def _md_inline(body: str) -> str:
    body = re.sub(r"\*\*([^*]+)\*\*", r"<b>\1</b>", body)
    body = re.sub(r"\*([^*]+)\*", r"<i>\1</i>", body)
    body = re.sub(r"`([^`]+)`", r"<code>\1</code>", body)
    # [text](url): escape already ran, so quotes are entities
    return re.sub(r"\[([^\]]+)\]\((https?://[^)\s]+)\)",
                  r'<a href="\2" target="_blank">\1</a>', body)


def md_to_html(md: str) -> str:
    """Minimal markdown (headers/bold/italic/code/lists/links) ->
    HTML, matching the note block's preview (the Sakura markdown
    view/editor pair, include/jetstream/render/sakura/base.hh)."""
    esc = _esc(md)
    parts = []
    for par in re.split(r"\n\n+", esc):
        h = _MD_H.search(par)
        if h:
            n = len(h.group(1))
            parts.append(f"<h{n}>{_md_inline(h.group(2))}</h{n}>")
            continue
        lines = par.splitlines()
        if lines and all(re.match(r"^\s*[-*+]\s+", ln)
                         for ln in lines if ln.strip()):
            items = "".join(
                "<li>" + _md_inline(
                    re.sub(r"^\s*[-*+]\s+", "", ln)) + "</li>"
                for ln in lines if ln.strip())
            parts.append(f"<ul>{items}</ul>")
            continue
        if lines and all(re.match(r"^\s*\d+[.)]\s+", ln)
                         for ln in lines if ln.strip()):
            items = "".join(
                "<li>" + _md_inline(
                    re.sub(r"^\s*\d+[.)]\s+", "", ln)) + "</li>"
                for ln in lines if ln.strip())
            parts.append(f"<ol>{items}</ol>")
            continue
        parts.append("<p>" + _md_inline(par).replace("\n", "<br>")
                     + "</p>")
    return "".join(parts)


def highlight(code: str, kind: str = "py", err_line: int = 0) -> str:
    if kind == "md":
        return md_to_html(code)
    return py_highlight(code, err_line)
