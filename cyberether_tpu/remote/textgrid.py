"""Retained text grid — the server-side cognate of the reference's
Sakura ``Retained::TextGrid``
(include/jetstream/render/sakura/components/retained/text_grid.hh:17-92:
value, editable, font size/scale, line numbers, active line,
stick-to-bottom, wrap none/character/word, per-line scale/indent,
styled spans with color keys, content metrics).

The reference rasterizes glyph quads into GPU buffers; here the grid
renders to styled HTML that the web editor blits (all string->HTML
logic stays server-side under golden tests, like the highlighter), and
``metrics()`` reports the same contentHeight / per-source-line layout
the reference exposes for scroll anchoring.
"""

from __future__ import annotations

import html as _html
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

#: (start_col, end_col, style_id) — style 0 is the default text style
Span = Tuple[int, int, int]


@dataclass
class TextGridConfig:
    value: str = ""
    editable: bool = False
    font_size: float = 15.0
    font_scale: float = 1.0
    monospace: bool = True
    line_numbers: bool = False
    show_active_line: bool = True
    stick_to_bottom: bool = False
    scrollbar: bool = True
    wrap: str = "none"                  # none | character | word
    line_scale: List[float] = field(default_factory=list)
    line_indent: List[float] = field(default_factory=list)
    style_color_keys: List[str] = field(default_factory=list)
    style_background_color_keys: List[str] = field(default_factory=list)


class TextGrid:
    def __init__(self, config: Optional[TextGridConfig] = None,
                 **kw) -> None:
        self.config = config or TextGridConfig(**kw)
        self._spans: Dict[int, List[Span]] = {}
        self.active_line = 0

    # -- content ------------------------------------------------------
    @property
    def lines(self) -> List[str]:
        return self.config.value.split("\n")

    def set_value(self, value: str) -> None:
        self.config.value = value
        self._spans.clear()

    def append_line(self, line: str,
                    spans: Optional[Sequence[Span]] = None) -> None:
        v = self.config.value
        # spans key on the FIRST physical line of the appended text —
        # a record containing embedded newlines becomes several
        # physical lines, and the caller's columns were computed
        # against the text's start
        first_idx = len(self.lines) if v else 0
        self.config.value = line if not v else v + "\n" + line
        if spans:
            self._spans[first_idx] = list(spans)

    def set_line_styles(self, line: int,
                        spans: Sequence[Span]) -> None:
        self._spans[line] = list(spans)

    # -- layout -------------------------------------------------------
    def _wrap_line(self, text: str, width: int) -> List[Tuple[int, str]]:
        """Split one source line into (start_col, text) visual rows."""
        mode = self.config.wrap
        if mode == "none" or width <= 0 or len(text) <= width:
            return [(0, text)]
        rows: List[Tuple[int, str]] = []
        if mode == "character":
            for i in range(0, len(text), width):
                rows.append((i, text[i:i + width]))
            return rows
        # word wrap: break at the last space inside the window
        i = 0
        while i < len(text):
            if len(text) - i <= width:
                rows.append((i, text[i:]))
                break
            cut = text.rfind(" ", i + 1, i + width + 1)
            if cut <= i:
                cut = i + width            # no space: hard break
            rows.append((i, text[i:cut]))
            i = cut if text[cut:cut + 1] != " " else cut + 1
        return rows or [(0, "")]

    def metrics(self, width_cols: int = 0) -> Dict:
        """contentHeight + per-source-line {top, height} in pixels
        (text_grid.hh Metrics/LineMetrics)."""
        fs = self.config.font_size * self.config.font_scale
        line_h = fs * 1.4
        top = 0.0
        out = []
        for i, text in enumerate(self.lines):
            scale = (self.config.line_scale[i]
                     if i < len(self.config.line_scale) else 1.0)
            rows = self._wrap_line(text, width_cols)
            h = line_h * scale * len(rows)
            out.append({"top": top, "height": h})
            top += h
        return {"contentHeight": top, "sourceLines": out,
                "stickToBottom": self.config.stick_to_bottom}

    # -- rendering ----------------------------------------------------
    def _styled_row(self, line_idx: int, start: int,
                    text: str) -> str:
        spans = sorted(self._spans.get(line_idx, ()),
                       key=lambda s: s[0])
        if not spans:
            return _html.escape(text)
        end = start + len(text)
        parts: List[str] = []
        pos = start
        for s0, s1, sid in spans:
            s0, s1 = max(s0, start), min(s1, end)
            if s1 <= pos:
                continue
            if s0 > pos:
                parts.append(_html.escape(text[pos - start:s0 - start]))
            keys = self.config.style_color_keys
            cls = keys[sid] if 0 <= sid < len(keys) else f"s{sid}"
            parts.append(f'<span class="tg-{cls}">'
                         f'{_html.escape(text[s0 - start:s1 - start])}'
                         f'</span>')
            pos = s1
        if pos < end:
            parts.append(_html.escape(text[pos - start:]))
        return "".join(parts)

    def render_rows(self, width_cols: int = 0) -> List[Dict]:
        """Visual rows: {line, start, html, active, indent, scale};
        wrapped continuation rows carry line=-1 gutter (the reference
        draws line numbers only on first visual rows)."""
        rows: List[Dict] = []
        for i, text in enumerate(self.lines):
            scale = (self.config.line_scale[i]
                     if i < len(self.config.line_scale) else 1.0)
            indent = (self.config.line_indent[i]
                      if i < len(self.config.line_indent) else 0.0)
            for j, (start, seg) in enumerate(
                    self._wrap_line(text, width_cols)):
                rows.append({
                    "line": i if j == 0 else -1,
                    "start": start,
                    "html": self._styled_row(i, start, seg),
                    "active": (self.config.show_active_line
                               and i == self.active_line),
                    "indent": indent, "scale": scale})
        return rows

    def render_html(self, width_cols: int = 0) -> str:
        c = self.config
        fs = c.font_size * c.font_scale
        fam = ("ui-monospace,Menlo,Consolas,monospace" if c.monospace
               else "system-ui,sans-serif")
        gutter = len(str(max(len(self.lines), 1)))
        out = [f'<div class="textgrid" style="font:{fs:g}px/1.4 {fam};'
               f'overflow:{"auto" if c.scrollbar else "hidden"}"'
               + (' data-stick="1"' if c.stick_to_bottom else "")
               + (' data-editable="1"' if c.editable else "") + ">"]
        for r in self.render_rows(width_cols):
            num = ""
            if c.line_numbers:
                label = "" if r["line"] < 0 else str(r["line"] + 1)
                num = (f'<span class="tg-num" style="display:inline-'
                       f'block;width:{gutter}ch;opacity:.5;'
                       f'text-align:right;margin-right:1ch">'
                       f'{label}</span>')
            style = []
            if r["scale"] != 1.0:
                style.append(f"font-size:{fs * r['scale']:g}px")
            if r["indent"]:
                style.append(f"padding-left:{r['indent']:g}ch")
            cls = "tg-row tg-active" if r["active"] else "tg-row"
            sattr = f' style="{";".join(style)}"' if style else ""
            out.append(f'<div class="{cls}"{sattr}>{num}'
                       f'{r["html"] or "&nbsp;"}</div>')
        out.append("</div>")
        return "".join(out)
