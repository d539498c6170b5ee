"""Node-editor single-page app served by the remote server.

The browser-side analog of the reference's compositor flowgraph editor
(src/compositor/default/, imnodes canvas with per-dtype colored links,
block picker, config editors, per-node metrics): draggable nodes on an
SVG canvas, drag-to-connect ports, block picker sidebar, config panel
with schema-typed fields, live state/metrics badges, and the streamed
surface frames along the bottom.  Positions persist through the
flowgraph's ``meta.node`` channel (YAML v2 layout)."""

EDITOR_PAGE = r"""<!DOCTYPE html>
<html><head><title>CyberEther-TPU</title><meta charset="utf-8"><style>
:root{--bg:#14161a;--panel:#1d2026;--edge:#31353d;--txt:#d6d9de;
 --dim:#8a8f98;--acc:#4cc2ff;--ok:#51d88a;--err:#ff6b6b;--warn:#ffc857;
 --node:#20242b;--surf:#0d0f12}
body.light{--bg:#f2f3f5;--panel:#e7e9ec;--edge:#c4c8cf;--txt:#23262b;
 --dim:#6b717c;--acc:#0077cc;--ok:#1a9e55;--err:#cc3333;--warn:#a97700;
 --node:#ffffff;--surf:#fafbfc}
*{box-sizing:border-box}
body{margin:0;background:var(--bg);color:var(--txt);
 font:13px/1.4 ui-monospace,Menlo,Consolas,monospace;height:100vh;
 display:flex;flex-direction:column;overflow:hidden}
#top{display:flex;align-items:center;gap:12px;padding:6px 12px;
 background:var(--panel);border-bottom:1px solid var(--edge)}
#top h1{font-size:14px;margin:0;color:var(--acc)}
#top select,#top button,input,textarea{background:#14161a;
 color:var(--txt);border:1px solid var(--edge);border-radius:4px;
 padding:3px 6px;font:inherit}
#top button:hover{border-color:var(--acc);cursor:pointer}
#main{flex:1;display:flex;min-height:0}
#picker{width:210px;background:var(--panel);
 border-right:1px solid var(--edge);display:flex;flex-direction:column}
#picker input{margin:8px;flex-shrink:0}
#types{overflow-y:auto;flex:1}
.type{padding:5px 10px;cursor:grab;border-bottom:1px solid #00000033}
.type:hover{background:#262a31}
.type .lbl{color:var(--txt)} .type .sum{color:var(--dim);font-size:11px}
#canvaswrap{flex:1;position:relative;overflow:hidden}
svg{width:100%;height:100%;display:block}
.splitter{flex-shrink:0;background:transparent;z-index:5}
.splitter.v{width:5px;cursor:col-resize;margin:0 -2px}
.splitter.h{height:5px;cursor:row-resize;margin:-2px 0}
.splitter:hover{background:var(--acc);opacity:.4}
#side{width:300px;background:var(--panel);
 border-left:1px solid var(--edge);overflow-y:auto;padding:10px}
#side h3{margin:4px 0;color:var(--acc);font-size:13px}
#side .row{margin:6px 0}
#side label{display:block;color:var(--dim);font-size:11px}
#side input,#side textarea,#side select{width:100%}
#side button{margin-top:6px;margin-right:6px;background:#14161a;
 color:var(--txt);border:1px solid var(--edge);border-radius:4px;
 padding:4px 10px;cursor:pointer}
#side button:hover{border-color:var(--acc)}
#side button.danger:hover{border-color:var(--err);color:var(--err)}
#surfaces{height:232px;background:var(--panel);
 border-top:1px solid var(--edge);display:flex;gap:8px;padding:6px;
 overflow-x:auto}
.surface{text-align:center;flex-shrink:0}
.surface canvas{border:1px solid var(--edge);background:var(--surf);
 cursor:crosshair}
.surface .cap{color:var(--dim);font-size:11px}
.acgrid{margin:2px auto;border-collapse:collapse;font-size:10px;
 font-family:ui-monospace,monospace;color:var(--txt)}
.acgrid th{color:var(--dim);font-weight:normal;text-align:left;
 padding:0 6px;border-bottom:1px solid var(--edge)}
.acgrid td{padding:0 6px;text-align:left}
.textgrid .tg-err{color:#f66}.textgrid .tg-warn{color:#fb5}
.textgrid .tg-info{color:var(--dim)}
.textgrid .tg-active{background:#ffffff14}
#toast{position:absolute;bottom:12px;left:50%;
 transform:translateX(-50%);background:var(--panel);color:var(--txt);
 border:1px solid var(--edge);border-radius:6px;padding:6px 14px;
 opacity:0;transition:opacity .25s;pointer-events:none;z-index:10}
#modalbg{position:fixed;inset:0;background:#0009;display:none;
 align-items:center;justify-content:center;z-index:20}
#modal{background:var(--panel);border:1px solid var(--edge);
 border-radius:8px;min-width:480px;max-width:80vw;max-height:80vh;
 display:flex;flex-direction:column}
#modalhead{display:flex;justify-content:space-between;padding:8px 14px;
 border-bottom:1px solid var(--edge);color:var(--acc);font-weight:bold}
#modalhead button{background:none;border:none;color:var(--dim);
 cursor:pointer;font-size:14px}
#modalbody{padding:12px 14px;overflow:auto}
#modalbody table{border-collapse:collapse;width:100%}
#modalbody td,#modalbody th{border:1px solid var(--edge);
 padding:3px 8px;text-align:right}
#modalbody th:first-child,#modalbody td:first-child{text-align:left}
#modalbody textarea{width:640px;height:360px;font:inherit}
.codewrap{position:relative;border:1px solid var(--edge);
 border-radius:4px;background:#0d0f12}
.codewrap textarea{position:relative;display:block;width:100%;
 box-sizing:border-box;background:transparent;color:transparent;
 caret-color:var(--txt);border:none;resize:vertical;z-index:2;
 font:12px/1.45 ui-monospace,monospace;padding:6px;margin:0;
 white-space:pre;overflow:auto}
.codewrap pre.codehl{position:absolute;inset:0;margin:0;z-index:1;
 font:12px/1.45 ui-monospace,monospace;padding:6px;color:var(--txt);
 white-space:pre;overflow:hidden;pointer-events:none}
.codehl .kw{color:#c792ea}.codehl .str{color:#c3e88d}
.codehl .cmt{color:#5c6370;font-style:italic}
.codehl .num{color:#f78c6c}.codehl .dec{color:#ffcb6b}
.codehl .fn{color:#82aaff}
.codehl .errline{background:#e0607022;outline:1px solid #e0607066}
.md h1,.md h2,.md h3{color:var(--acc);margin:4px 0}
.md code{background:var(--bg);padding:0 4px;border-radius:3px}
.md p{margin:4px 0}
.node{cursor:grab}
.node rect.body{fill:var(--node);stroke:var(--edge);stroke-width:1.2;rx:6}
.node.sel rect.body{stroke:var(--acc);stroke-width:2}
.node text{fill:var(--txt);pointer-events:none}
.node text.t{font-weight:bold}
.node text.sub{fill:var(--dim);font-size:10px}
.node text.pl{fill:var(--dim);font-size:10px}
.port{stroke:#14161a;stroke-width:1;cursor:crosshair}
.port:hover{stroke:#fff}
.link{fill:none;stroke-width:2;opacity:.85}
.link.ghost{stroke-dasharray:5 4;opacity:.6}
#err{color:var(--err)}
#audio-arm.on{color:var(--ok,#6c6)}
.metric{color:var(--warn);font-size:11px}
</style></head><body>
<div id="top">
 <h1>CyberEther-TPU</h1>
 <select id="fgsel"></select>
 <button id="addbtn">+ block</button>
 <button id="savebtn" title="persist node layout">save layout</button>
 <select id="exsel" title="example flowgraphs"></select>
 <button id="openex">open</button>
 <button id="benchbtn">benchmark</button>
 <button id="yamlbtn">yaml</button>
 <button id="themebtn" title="toggle light/dark">◐</button>
 <button id="audio-arm" title="enable audio playback"
         style="display:none">🔊</button>
 <button id="helpbtn">?</button>
 <span id="status" style="color:var(--dim)"></span>
</div>
<div id="main">
 <div id="picker"><input id="search" placeholder="filter blocks…">
  <div id="types"></div></div>
 <div class="splitter v" data-panel="picker" data-edge="right"></div>
 <div id="canvaswrap"><svg id="cv">
   <defs></defs><g id="links"></g><g id="nodes"></g>
   <path id="ghost" class="link ghost" stroke="#888" d=""/>
 </svg><div id="toast"></div></div>
 <div id="modalbg"><div id="modal">
  <div id="modalhead"><span id="modaltitle"></span>
   <button id="modalclose">✕</button></div>
  <div id="modalbody"></div>
 </div></div>
 <div class="splitter v" data-panel="side" data-edge="left"></div>
 <div id="side"><h3>inspector</h3>
  <div id="insp" style="color:var(--dim)">select a node</div></div>
</div>
<div class="splitter h" data-panel="surfaces" data-edge="top"></div>
<div id="surfaces"></div>
<script>
"use strict";
const qtok = new URLSearchParams(location.search).get("token");
const tq = qtok ? `?token=${encodeURIComponent(qtok)}` : "";
const api = (p) => fetch(`/api/v1/${p}${tq}`).then(r => {
  if (!r.ok) return r.text().then(t => {throw new Error(t || r.status)});
  return r.json();
});
const apiSend = (method, p, body) =>
  fetch(`/api/v1/${p}${tq}`, {method,
    headers: {"Content-Type": "application/json"},
    body: JSON.stringify(body || {})}).then(r => {
      if (!r.ok) return r.text().then(t => {
        throw new Error(t || r.status)});
      return r.json();
    });

// dtype -> link color (the reference's per-dtype colored links)
const DT_COLORS = {F32: "#51d88a", F64: "#39b87a", CF32: "#4cc2ff",
  CF64: "#3a9bd4", I8: "#c792ea", I16: "#b480e0", I32: "#a06cd5",
  I64: "#8b59c9", U8: "#ffc857", U16: "#f5b53f", U32: "#e8a428",
  U64: "#d99214"};
const dtColor = d => DT_COLORS[d] || "#9aa0a8";

let registry = {}, view = {}, metrics = {}, fgName = null;
let sel = null, positions = {}, dirtyLayout = false;

function toast(msg, err) {
  const t = document.getElementById("toast");
  t.textContent = msg; t.style.color = err ? "var(--err)" : "var(--txt)";
  t.style.opacity = 1; clearTimeout(t._h);
  t._h = setTimeout(() => t.style.opacity = 0, err ? 4500 : 1800);
}

// ---- modal + toolbar (the compositor's modals: benchmark, settings,
// examples, info — src/compositor/default/presenters/modal/) ---------
function showModal(title, html) {
  document.getElementById("modaltitle").textContent = title;
  document.getElementById("modalbody").innerHTML = html;
  document.getElementById("modalbg").style.display = "flex";
}
function hideModal() {
  document.getElementById("modalbg").style.display = "none";
}
document.getElementById("modalclose").onclick = hideModal;
document.getElementById("modalbg").addEventListener("pointerdown",
  (ev) => { if (ev.target.id === "modalbg") hideModal(); });
document.addEventListener("keydown",
  (ev) => { if (ev.key === "Escape") hideModal(); });

// ---- command palette (the Sakura palette widget,
// include/jetstream/render/sakura/base.hh) — ctrl/cmd-K -------------
function paletteCommands() {
  const cmds = [];
  for (const t of Object.keys(registry).sort())
    cmds.push({label: `add block: ${t}`, run: () => addBlock(t)});
  const ex = document.getElementById("exsel");
  for (const o of ex.options)
    if (o.value) cmds.push({label: `open example: ${o.value}`,
      run: () => { ex.value = o.value;
        document.getElementById("openex").click(); }});
  cmds.push(
    {label: "show: yaml", run: () =>
      document.getElementById("yamlbtn").click()},
    {label: "show: benchmark", run: () =>
      document.getElementById("benchbtn").click()},
    {label: "show: help", run: () =>
      document.getElementById("helpbtn").click()},
    {label: "show: logs", run: showLogs},
    {label: "toggle theme", run: () =>
      document.getElementById("themebtn").click()},
    {label: "save layout", run: () =>
      document.getElementById("savebtn").click()},
    {label: "undo", run: () => doUndoRedo("undo")},
    {label: "redo", run: () => doUndoRedo("redo")});
  return cmds;
}

// ---- log panel (retained TextGrid widget, server-rendered) --------
async function showLogs() {
  try {
    const res = await api("logs");
    showModal("logs",
      `<div id="logbody" style="max-height:420px;overflow:auto;` +
      `min-width:520px">` +
      (res.count ? res.html :
       `<span style="color:var(--dim)">no records yet</span>`) +
      `</div>`);
    const el = document.getElementById("logbody");
    if (res.metrics && res.metrics.stickToBottom)
      el.scrollTop = el.scrollHeight;
  } catch (e) { toast("logs failed: " + e.message, true); }
}

// ---- undo/redo: server-side snapshot journal (Sakura action queue
// cognate); ctrl-Z / ctrl-shift-Z / ctrl-Y --------------------------
async function doUndoRedo(kind) {
  if (!fgName) return;
  try {
    const res = await apiSend("POST",
      `flowgraph/${fgName}/${kind}`, {});
    if (res.ok) { sel = null; toast(kind + " ✓"); refresh(); }
    else toast(`nothing to ${kind}`, true);
  } catch (e) { toast(`${kind} failed: ` + e.message, true); }
}
document.addEventListener("keydown", (ev) => {
  if (!(ev.ctrlKey || ev.metaKey)) return;
  const tag = (document.activeElement || {}).tagName;
  if (tag === "INPUT" || tag === "TEXTAREA") return;
  const k = ev.key.toLowerCase();
  if (k === "z" && !ev.shiftKey) {
    ev.preventDefault(); doUndoRedo("undo");
  } else if (k === "y" || (k === "z" && ev.shiftKey)) {
    ev.preventDefault(); doUndoRedo("redo");
  }
});

function openPalette() {
  showModal("command palette",
    `<input id="palin" placeholder="type a command…" ` +
    `style="width:420px"><div id="pallist" ` +
    `style="margin-top:8px;max-height:320px;overflow:auto"></div>`);
  const input = document.getElementById("palin");
  const list = document.getElementById("pallist");
  const cmds = paletteCommands();
  let hi = 0, shown = [];
  const renderList = () => {
    const q = input.value.toLowerCase();
    shown = cmds.filter(c => c.label.toLowerCase().includes(q))
      .slice(0, 14);
    hi = Math.min(hi, Math.max(shown.length - 1, 0));
    list.innerHTML = shown.map((c, i) =>
      `<div data-i="${i}" style="padding:3px 8px;cursor:pointer;` +
      `border-radius:4px;${i === hi ?
        "background:#2a2e36;color:var(--acc)" : ""}">` +
      `${c.label}</div>`).join("") ||
      `<div style="color:var(--dim)">no matches</div>`;
    for (const el of list.children) {
      el.onclick = () => { hideModal(); shown[+el.dataset.i].run(); };
    }
  };
  input.addEventListener("input", () => { hi = 0; renderList(); });
  input.addEventListener("keydown", (ev) => {
    if (ev.key === "ArrowDown") { hi++; renderList(); ev.preventDefault(); }
    else if (ev.key === "ArrowUp") {
      hi = Math.max(hi - 1, 0); renderList(); ev.preventDefault(); }
    else if (ev.key === "Enter" && shown[hi]) {
      hideModal(); shown[hi].run(); }
  });
  renderList();
  input.focus();
}
document.addEventListener("keydown", (ev) => {
  if ((ev.ctrlKey || ev.metaKey) && ev.key.toLowerCase() === "k") {
    ev.preventDefault(); openPalette();
  }
});

// ---- dockspace-lite: draggable splitters resize the picker /
// inspector / surfaces panels; sizes persist (the Sakura dockspace,
// include/jetstream/render/sakura/base.hh) ---------------------------
for (const sp of document.querySelectorAll(".splitter")) {
  const panel = document.getElementById(sp.dataset.panel);
  const horiz = sp.classList.contains("v");
  const prop = horiz ? "width" : "height";
  const saved = localStorage.getItem("ce_sz_" + sp.dataset.panel);
  if (saved) panel.style[prop] = saved;
  sp.addEventListener("pointerdown", (ev) => {
    ev.preventDefault();
    sp.setPointerCapture(ev.pointerId);
    const start = horiz ? ev.clientX : ev.clientY;
    const base = horiz ? panel.offsetWidth : panel.offsetHeight;
    const sign = sp.dataset.edge === "right" ? 1 : -1;
    const move = (mv) => {
      const d = ((horiz ? mv.clientX : mv.clientY) - start) * sign;
      const sz = Math.max(90, base + d) + "px";
      panel.style[prop] = sz;
      localStorage.setItem("ce_sz_" + sp.dataset.panel, sz);
    };
    const up = () => {
      sp.removeEventListener("pointermove", move);
      sp.removeEventListener("pointerup", up);
    };
    sp.addEventListener("pointermove", move);
    sp.addEventListener("pointerup", up);
  });
}

document.getElementById("audio-arm").onclick = () => armAudio();

document.getElementById("themebtn").onclick = () => {
  document.body.classList.toggle("light");
  localStorage.setItem("ce_theme",
    document.body.classList.contains("light") ? "light" : "dark");
};
if (localStorage.getItem("ce_theme") === "light")
  document.body.classList.add("light");

document.getElementById("helpbtn").onclick = () => showModal("help",
  `<div class="md"><h3>node editor</h3>
   <p>drag a block type from the left panel onto the canvas · drag an
   output port onto an input port to connect · drag off an input port
   to disconnect · select a node to edit its config on the right</p>
   <h3>surfaces</h3>
   <p>plots stream along the bottom; hover for a cursor readout with
   axis units</p>
   <h3>api</h3>
   <p><code>/api/v1/flowgraphs · registry · metrics · benchmark ·
   examples · flowgraph/{fg}/yaml</code></p></div>`);

document.getElementById("benchbtn").onclick = async () => {
  try {
    const comps = await api("benchmarks");
    showModal("benchmark",
      `<div class="row"><select id="benchsel">` +
      comps.map(c => `<option>${c}</option>`).join("") +
      `</select> <button id="benchrun">run</button></div>` +
      `<div id="benchout" style="margin-top:8px;color:var(--dim)">` +
      `pick a component — runs on the live backend</div>`);
    document.getElementById("benchrun").onclick = async () => {
      const c = document.getElementById("benchsel").value;
      const out = document.getElementById("benchout");
      out.textContent = `running ${c}…`;
      try {
        const res = await apiSend("POST", "benchmark", {component: c});
        out.innerHTML = `<table><tr><th>case</th><th>ops/s</th>` +
          `<th>ms/op</th><th>samples/s</th></tr>` + res.map(m =>
            `<tr><td>${m.component} ${m.variant}</td>` +
            `<td>${(m.ops_per_sec || 0).toFixed(1)}</td>` +
            `<td>${(m.ms_per_op || 0).toFixed(3)}</td>` +
            `<td>${m.samples_per_sec ?
              (m.samples_per_sec / 1e6).toFixed(1) + " M" : "—"}</td></tr>`
          ).join("") + `</table>`;
      } catch (e) { out.textContent = "failed: " + e.message; }
    };
  } catch (e) { toast("benchmark list failed: " + e.message, true); }
};

document.getElementById("yamlbtn").onclick = async () => {
  try {
    const r = await fetch(`/api/v1/flowgraph/${fgName}/yaml${tq}`);
    if (!r.ok) throw new Error(await r.text());
    const text = await r.text();
    showModal(`flowgraph yaml — ${fgName}`,
      `<textarea id="yamltext" spellcheck="false"></textarea>
       <div class="row" style="margin-top:8px">
        <button id="yamlimport">import (replace graph)</button>
        <button id="yamlcopy">copy</button></div>`);
    document.getElementById("yamltext").value = text;
    document.getElementById("yamlcopy").onclick = () =>
      navigator.clipboard.writeText(
        document.getElementById("yamltext").value)
        .then(() => toast("copied"));
    document.getElementById("yamlimport").onclick = async () => {
      try {
        await apiSend("POST", "flowgraph/import",
          {name: fgName, yaml: document.getElementById("yamltext").value});
        hideModal(); toast("imported"); sel = null; boot();
      } catch (e) { toast("import failed: " + e.message, true); }
    };
  } catch (e) { toast("yaml export failed: " + e.message, true); }
};

document.getElementById("openex").onclick = async () => {
  const ex = document.getElementById("exsel").value;
  if (!ex) return;
  try {
    await apiSend("POST", "flowgraph/import",
      {name: fgName || "main", example: ex});
    toast(`opened example ${ex}`); sel = null; boot();
  } catch (e) { toast("open failed: " + e.message, true); }
};

// ---- geometry ------------------------------------------------------
const NW = 168, RH = 16, HDR = 34;
function nodeH(b) {
  if (b.type === "note" && (b.config || {}).content)
    return HDR + Math.min(160, 14 +
      (b.config.content.split("\n").length) * 13);
  return HDR + Math.max(inPorts(b).length, outPorts(b).length) * RH + 8;
}
function inPorts(b) {
  const decl = (registry[b.type] || {}).input_ports || [];
  const wired = Object.keys(b.inputs || {});
  return [...new Set([...decl, ...wired])];
}
function outPorts(b) {
  const decl = (registry[b.type] || {}).output_ports || [];
  const actual = Object.keys(b.outputs || {});
  return actual.length ? actual : decl;
}
function portPos(name, port, isOut) {
  const b = blocks()[name]; if (!b) return [0, 0];
  const [x, y] = positions[name] || [0, 0];
  const list = isOut ? outPorts(b) : inPorts(b);
  const i = Math.max(list.indexOf(port), 0);
  return [x + (isOut ? NW : 0), y + HDR + i * RH - 5];
}
function blocks() { return (view[fgName] || {blocks: {}}).blocks; }

function autoLayout() {
  // topological columns for nodes without saved positions
  const bs = blocks(); const col = {}, seen = {};
  const depth = (n, guard) => {
    if (n in col) return col[n];
    if (guard.has(n)) return 0;
    guard.add(n);
    let d = 0;
    for (const l of Object.values(bs[n].inputs || {})) {
      const m = l.match(/\$\{graph\.([^.]+)\./);
      if (m && bs[m[1]]) d = Math.max(d, depth(m[1], guard) + 1);
    }
    col[n] = d; return d;
  };
  const rows = {};
  for (const n of Object.keys(bs)) {
    const m = (bs[n].meta || {}).node;
    if (m && m.position) { positions[n] = [...m.position]; continue; }
    if (positions[n]) continue;
    const d = depth(n, new Set());
    rows[d] = (rows[d] || 0);
    positions[n] = [40 + d * 230, 40 + rows[d] * 130];
    rows[d]++;
  }
}

// ---- render --------------------------------------------------------
const SVGNS = "http://www.w3.org/2000/svg";
const el = (t, attrs, parent) => {
  const e = document.createElementNS(SVGNS, t);
  for (const [k, v] of Object.entries(attrs || {})) e.setAttribute(k, v);
  if (parent) parent.appendChild(e);
  return e;
};
const STATE_COLOR = {complete: "var(--ok)", incomplete: "var(--warn)",
  errored: "var(--err)"};

function render() {
  autoLayout();
  const bs = blocks();
  const gn = document.getElementById("nodes");
  const gl = document.getElementById("links");
  gn.innerHTML = ""; gl.innerHTML = "";
  for (const [name, b] of Object.entries(bs)) {
    for (const [port, link] of Object.entries(b.inputs || {})) {
      const m = link.match(/\$\{graph\.([^.]+)\.output\.([^}]+)\}/);
      if (!m || !bs[m[1]]) continue;
      const [x1, y1] = portPos(m[1], m[2], true);
      const [x2, y2] = portPos(name, port, false);
      const dt = ((bs[m[1]].outputs || {})[m[2]] || {}).dtype;
      const dx = Math.max(40, Math.abs(x2 - x1) / 2);
      el("path", {class: "link", stroke: dtColor(dt),
        d: `M${x1},${y1} C${x1 + dx},${y1} ${x2 - dx},${y2} ${x2},${y2}`,
        "data-to": `${name}:${port}`}, gl);
    }
  }
  for (const [name, b] of Object.entries(bs)) {
    const [x, y] = positions[name];
    const h = nodeH(b);
    const g = el("g", {class: "node" + (sel === name ? " sel" : ""),
      transform: `translate(${x},${y})`, "data-name": name}, gn);
    el("rect", {class: "body", width: NW, height: h, rx: 6}, g);
    el("rect", {width: NW, height: 3, rx: 1.5, y: 0,
      fill: STATE_COLOR[b.state] || "var(--dim)"}, g);
    const t = el("text", {x: 8, y: 16, class: "t"}, g);
    t.textContent = name;
    const s = el("text", {x: 8, y: 28, class: "sub"}, g);
    const tm = ((metrics[fgName] || {}).timings || {});
    const mt = Object.entries(tm).find(([k]) =>
      k.split(",").includes(name));
    s.textContent = b.type + (mt ? ` ${mt[1].avg_ms.toFixed(2)}ms` : "");
    inPorts(b).forEach((p, i) => {
      el("circle", {class: "port in", r: 4.5, cx: 0,
        cy: HDR + i * RH - 5, fill: "#9aa0a8",
        "data-node": name, "data-port": p}, g);
      const l = el("text", {x: 8, y: HDR + i * RH - 2, class: "pl"}, g);
      l.textContent = p;
    });
    outPorts(b).forEach((p, i) => {
      const dt = ((b.outputs || {})[p] || {}).dtype;
      el("circle", {class: "port out", r: 4.5, cx: NW,
        cy: HDR + i * RH - 5, fill: dtColor(dt),
        "data-node": name, "data-port": p}, g);
      const l = el("text", {x: NW - 8, y: HDR + i * RH - 2,
        class: "pl", "text-anchor": "end"}, g);
      l.textContent = p;
    });
    if (b.type === "note" && (b.config || {}).content) {
      // markdown rendered inside the node (Sakura markdown view);
      // HTML comes from the server-side renderer
      const fo = el("foreignObject",
        {x: 6, y: HDR - 4, width: NW - 12, height: h - HDR}, g);
      const div = document.createElement("div");
      div.className = "md";
      div.style.cssText = "font-size:9px;overflow:hidden;" +
        "pointer-events:none;color:var(--txt)";
      serverHighlight(b.config.content, "md", 0).then((h2) => {
        if (h2 !== null) div.innerHTML = h2;
      });
      fo.appendChild(div);
    }
  }
  renderInspector();
}

function renderInspector() {
  const insp = document.getElementById("insp");
  const b = sel && blocks()[sel];
  if (!b) { insp.innerHTML = "<span style='color:var(--dim)'>select " +
    "a node</span>"; return; }
  const reg = registry[b.type] || {};
  let html = `<div class="row"><b>${sel}</b> <span style="color:` +
    `${STATE_COLOR[b.state] || 'var(--dim)'}">${b.state}</span></div>` +
    `<div class="row" style="color:var(--dim)">${b.type} · ` +
    `${b.device}/${b.runtime}</div>`;
  if (b.error) html += `<div class="row" id="err">${b.error}</div>`;
  html += `<h3>config</h3>`;
  const fields = reg.config || [];
  const known = new Set(fields.map(f => f.name));
  for (const f of fields) {
    const v = b.config[f.name] !== undefined ? b.config[f.name]
      : f.default;
    const label = `<label>${f.name} <i>(${f.type})</i>` +
      `${f.help ? " — " + f.help : ""}</label>`;
    // code/markdown fields get a monospace multi-line editor (the
    // compositor's python/markdown field editors); "code" gets the
    // syntax-highlighted overlay (the reference's tree-sitter code
    // editor, src/render/sakura/ + domains/core/python/module.hh)
    if (f.name === "code") {
      const esc = (v || "").replace(/&/g, "&amp;").replace(/</g, "&lt;");
      html += `<div class="row">${label}<div class="codewrap">` +
        `<pre class="codehl" id="hl_${f.name}"></pre>` +
        `<textarea data-cfg-raw="${f.name}" data-hl="hl_${f.name}" ` +
        `rows="10" spellcheck="false">${esc}</textarea></div></div>`;
    } else if (f.name === "content" ||
        (typeof v === "string" && v.includes("\n"))) {
      const esc = (v || "").replace(/&/g, "&amp;").replace(/</g, "&lt;");
      html += `<div class="row">${label}<textarea data-cfg-raw=` +
        `"${f.name}" rows="8" spellcheck="false">${esc}</textarea></div>`;
    } else {
      html += `<div class="row">${label}` +
        `<input data-cfg="${f.name}" value='${v === null ||
          v === undefined ? "" : JSON.stringify(v)}'></div>`;
    }
  }
  if (b.type === "note") {
    html += `<h3>preview</h3><div class="md" id="mdprev"></div>`;
  }
  const extra = Object.fromEntries(Object.entries(b.config)
    .filter(([k]) => !known.has(k)));
  html += `<div class="row"><label>extra config (JSON)</label>` +
    `<textarea id="cfgextra" rows="2">` +
    `${Object.keys(extra).length ? JSON.stringify(extra) : ""}` +
    `</textarea></div>`;
  html += `<h3>inputs</h3>`;
  for (const p of inPorts(b)) {
    html += `<div class="row"><label>${p}</label>` +
      `<input data-inp="${p}" value="${b.inputs[p] || ""}"></div>`;
  }
  const mets = ((metrics[fgName] || {}).metrics || {});
  const mine = Object.entries(mets).filter(([k]) =>
    k.startsWith(sel + "/") || k === sel);
  if (mine.length) {
    html += `<h3>metrics</h3>`;
    for (const [k, v] of mine)
      html += `<div class="metric">${k}: ${JSON.stringify(v)}</div>`;
  }
  html += `<div class="row"><button id="apply">apply</button>` +
    `<button id="del" class="danger">delete</button></div>`;
  insp.innerHTML = html;
  if (b.type === "note") {
    // live markdown EDITOR: the content textarea re-renders the
    // preview as you type (Sakura's markdown editor+view pair)
    const renderMd = (txt) =>
      serverHighlight(txt, "md", 0).then((h) => {
        const el = document.getElementById("mdprev");
        if (el && h !== null) el.innerHTML = h;
      });
    renderMd(b.config.content || "");
    const ta = insp.querySelector('textarea[data-cfg-raw="content"]');
    if (ta) {
      let t = null;
      ta.addEventListener("input", () => {
        clearTimeout(t);
        t = setTimeout(() => renderMd(ta.value), 150);
      });
    }
  }
  // live syntax highlight for python code fields (rendered server-
  // side, remote/highlight.py); the block's error line is tinted
  for (const ta of insp.querySelectorAll("textarea[data-hl]")) {
    const pre = document.getElementById(ta.dataset.hl);
    const errLine = (() => {
      const m = (b.error || "").match(/line (\d+)/);
      return m ? parseInt(m[1], 10) : 0;
    })();
    let seq = 0;
    const sync = async () => {
      const s = ++seq;
      const h = await serverHighlight(ta.value, "py", errLine);
      if (h === null || s !== seq) return;   // stale response
      pre.innerHTML = h;
      pre.scrollTop = ta.scrollTop; pre.scrollLeft = ta.scrollLeft;
    };
    ta.addEventListener("input", sync);
    ta.addEventListener("scroll", () => {
      pre.scrollTop = ta.scrollTop; pre.scrollLeft = ta.scrollLeft;
    });
    sync();
  }
  document.getElementById("apply").onclick = applyConfig;
  document.getElementById("del").onclick = async () => {
    try {
      await fetch(`/api/v1/flowgraph/${fgName}/block/${sel}${tq}`,
        {method: "DELETE"}).then(r => { if (!r.ok) throw new Error(); });
      toast(`deleted ${sel}`); sel = null; refresh();
    } catch (e) { toast("delete failed: " + e.message, true); }
  };
}

// syntax highlight + markdown render happen SERVER-side
// (remote/highlight.py, golden-tested); the page only fetches the
// HTML and blits it.  Small memo so keystroke-repeat and tab-flips
// don't refetch.
const hlCache = new Map();
async function serverHighlight(code, kind, errLine) {
  const key = `${kind}\x00${errLine}\x00${code}`;
  if (hlCache.has(key)) return hlCache.get(key);
  try {
    const r = await fetch(`/api/v1/highlight${tq}`, {
      method: "POST",
      headers: {"Content-Type": "application/json"},
      body: JSON.stringify({code, kind, errLine})});
    if (!r.ok) return null;
    const h = (await r.json()).html;
    if (hlCache.size > 200) hlCache.clear();
    hlCache.set(key, h);
    return h;
  } catch (e) { return null; }
}

async function applyConfig() {
  const b = blocks()[sel]; if (!b) return;
  const cfg = {};
  for (const inp of document.querySelectorAll("[data-cfg]")) {
    const raw = inp.value.trim();
    if (raw === "") continue;
    try { cfg[inp.dataset.cfg] = JSON.parse(raw); }
    catch { cfg[inp.dataset.cfg] = raw; }
  }
  for (const ta of document.querySelectorAll("[data-cfg-raw]"))
    cfg[ta.dataset.cfgRaw] = ta.value;
  const extra = document.getElementById("cfgextra").value.trim();
  if (extra) try { Object.assign(cfg, JSON.parse(extra)); }
  catch { toast("extra config is not valid JSON", true); return; }
  try {
    await apiSend("PATCH", `flowgraph/${fgName}/block/${sel}`,
      {config: cfg});
    for (const inp of document.querySelectorAll("[data-inp]")) {
      const cur = b.inputs[inp.dataset.inp] || "";
      if (inp.value.trim() !== cur)
        await apiSend("POST", `flowgraph/${fgName}/connect`,
          {name: sel, port: inp.dataset.inp, link: inp.value.trim()});
    }
    toast("applied"); refresh();
  } catch (e) { toast("apply failed: " + e.message, true); }
}

// ---- interactions --------------------------------------------------
const cv = document.getElementById("cv");
let drag = null, wire = null;
const evPos = (ev) => {
  const r = cv.getBoundingClientRect();
  return [ev.clientX - r.left, ev.clientY - r.top];
};
cv.addEventListener("pointerdown", (ev) => {
  const port = ev.target.closest(".port");
  if (port) {
    if (port.classList.contains("out")) {
      wire = {from: port.dataset.node, port: port.dataset.port};
    } else {
      // drag off an input port = disconnect
      const n = port.dataset.node, p = port.dataset.port;
      if ((blocks()[n].inputs || {})[p]) {
        apiSend("POST", `flowgraph/${fgName}/connect`,
          {name: n, port: p, link: ""})
          .then(() => { toast(`disconnected ${n}.${p}`); refresh(); })
          .catch(e => toast("disconnect failed: " + e.message, true));
      }
    }
    ev.preventDefault(); return;
  }
  const node = ev.target.closest(".node");
  if (node) {
    const name = node.dataset.name;
    sel = name; render();
    const [px, py] = evPos(ev);
    drag = {name, dx: px - positions[name][0],
            dy: py - positions[name][1]};
  } else { sel = null; render(); }
});
cv.addEventListener("pointermove", (ev) => {
  const [px, py] = evPos(ev);
  if (drag) {
    positions[drag.name] = [px - drag.dx, py - drag.dy];
    dirtyLayout = true; render();
  } else if (wire) {
    const [x1, y1] = portPos(wire.from, wire.port, true);
    const dx = Math.max(40, Math.abs(px - x1) / 2);
    document.getElementById("ghost").setAttribute("d",
      `M${x1},${y1} C${x1 + dx},${y1} ${px - dx},${py} ${px},${py}`);
  }
});
cv.addEventListener("pointerup", async (ev) => {
  if (drag) { drag = null; saveLayoutSoon(); }
  if (wire) {
    document.getElementById("ghost").setAttribute("d", "");
    const port = ev.target.closest(".port.in");
    if (port) {
      try {
        await apiSend("POST", `flowgraph/${fgName}/connect`,
          {name: port.dataset.node, port: port.dataset.port,
           link: `\${graph.${wire.from}.output.${wire.port}}`});
        toast(`connected ${wire.from}.${wire.port} → ` +
              `${port.dataset.node}.${port.dataset.port}`);
        refresh();
      } catch (e) { toast("connect failed: " + e.message, true); }
    }
    wire = null;
  }
});

let saveT = null;
function saveLayoutSoon() {
  clearTimeout(saveT);
  saveT = setTimeout(saveLayout, 800);
}
async function saveLayout() {
  if (!dirtyLayout || !fgName) return;
  const layout = {};
  for (const [n, [x, y]] of Object.entries(positions))
    if (blocks()[n]) layout[n] = {position: [Math.round(x),
                                             Math.round(y)]};
  try {
    await apiSend("POST", `flowgraph/${fgName}/layout`, layout);
    dirtyLayout = false;
  } catch (e) { toast("layout save failed: " + e.message, true); }
}
document.getElementById("savebtn").onclick = () => {
  dirtyLayout = true; saveLayout(); toast("layout saved");
};

// ---- picker --------------------------------------------------------
function renderPicker() {
  const q = document.getElementById("search").value.toLowerCase();
  const root = document.getElementById("types");
  root.innerHTML = "";
  for (const [t, info] of Object.entries(registry).sort()) {
    if (q && !t.includes(q) &&
        !(info.label || "").toLowerCase().includes(q)) continue;
    const d = document.createElement("div");
    d.className = "type";
    d.innerHTML = `<div class="lbl">${info.label || t}</div>` +
      `<div class="sum">${info.summary || t}</div>`;
    d.onclick = () => addBlock(t);
    root.appendChild(d);
  }
}
document.getElementById("search").oninput = renderPicker;
document.getElementById("addbtn").onclick = () => {
  const t = prompt("block type:"); if (t) addBlock(t);
};
async function addBlock(type) {
  let base = type.replace(/[^a-z0-9]/g, ""), i = 1, name = base;
  while (blocks()[name]) name = base + (++i);
  const entered = prompt(`name for new '${type}' block:`, name);
  if (!entered) return;
  try {
    await apiSend("POST", `flowgraph/${fgName}/block`,
      {name: entered, type});
    positions[entered] = [260, 60 + Object.keys(blocks()).length * 40];
    toast(`created ${entered}`); sel = entered; refresh();
  } catch (e) { toast("create failed: " + e.message, true); }
}

// ---- data flow -----------------------------------------------------
async function refresh() {
  try {
    view = await api("flowgraphs");
    const names = Object.keys(view);
    const selEl = document.getElementById("fgsel");
    if (selEl.options.length !== names.length) {
      selEl.innerHTML = names.map(n =>
        `<option value="${n}">${n}</option>`).join("");
    }
    if (!fgName || !view[fgName]) fgName = names[0] || null;
    if (fgName) selEl.value = fgName;
    render();
  } catch (e) { toast("refresh failed: " + e.message, true); }
}
document.getElementById("fgsel").onchange = (ev) => {
  fgName = ev.target.value; sel = null; positions = {}; render();
};

async function boot() {
  try { registry = await api("registry"); } catch (e) {
    toast("registry load failed: " + e.message, true);
  }
  try {
    const ex = await api("examples");
    document.getElementById("exsel").innerHTML =
      `<option value="">examples…</option>` +
      Object.entries(ex).map(([n, t]) =>
        `<option value="${n}">${t || n}</option>`).join("");
  } catch (e) {}
  renderPicker();
  await refresh();
  setInterval(async () => {
    try { metrics = await api("metrics"); renderInspector(); }
    catch (e) {}
  }, 2000);
  const ws = new WebSocket(
    `ws${location.protocol === "https:" ? "s" : ""}://` +
    `${location.host}/api/v1/stream${tq}`);
  streamWs = ws;
  ws.binaryType = "arraybuffer";
  // presentation is serialized through a promise chain: decoding PNG
  // delta strips awaits createImageBitmap, and the retained-canvas
  // shift+blit is order-dependent — concurrent handlers could blit
  // strips out of order and scramble the waterfall until a keyframe
  let presentChain = Promise.resolve();
  ws.onmessage = (ev) => {
    if (typeof ev.data === "string") {
      const msg = JSON.parse(ev.data);
      if (msg.type === "view") { view = msg.view;
        if (!drag && !wire) render(); }
      return;
    }
    const dv = new DataView(ev.data);
    const hlen = dv.getUint32(0, true);
    const header = JSON.parse(new TextDecoder().decode(
      new Uint8Array(ev.data, 4, hlen)));
    const payload = ev.data.slice(4 + hlen);
    presentChain = presentChain
      .then(() => presentSurface(header, payload))
      .catch(() => {});
  };
  ws.onclose = () => document.getElementById("status")
    .textContent = "stream disconnected";
  document.getElementById("status").textContent = "connected";
}

// ---- surface rendering: axes + grid + cursor readout ---------------
// (client-side analog of the reference's lineplot thick-line kernel,
// axis ticks and cursor — visualization/lineplot/module_impl.cc)
const SW = 380, SH = 186, MARGIN = {l: 52, r: 8, t: 6, b: 22};
const surfState = {};   // name -> {header, data, bitmap, cursor}
let streamWs = null;    // input-event channel back to the server

// throttled live view-parameter updates (wheel zoom / drag pan ->
// module config zoom/offset via the WS input channel — the analog of
// the reference's WebRTC data-channel input events)
const inputPending = {};
function sendInput(name, config) {
  if (!streamWs || streamWs.readyState !== 1) return;
  inputPending[name] = config;
  if (!sendInput._t) {
    sendInput._t = setTimeout(() => {
      sendInput._t = null;
      for (const [n, cfg] of Object.entries(inputPending)) {
        streamWs.send(JSON.stringify(
          {type: "input", surface: n, config: cfg}));
        delete inputPending[n];
      }
    }, 40);
  }
}

function interactiveZoom(st, name, fx, factor) {
  const it = st.header && st.header.interactive;
  if (!it) return;
  const z2 = Math.min(Math.max(it.zoom * factor, 1), 64);
  const span2 = Math.floor(it.width / z2);
  let off2 = Math.round(it.offset + fx * it.span - fx * span2);
  off2 = Math.min(Math.max(off2, 0), it.width - span2);
  sendInput(name, {zoom: z2, offset: off2});
}

function interactivePan(st, name, dfx) {
  const it = st.header && st.header.interactive;
  if (!it || it.zoom <= 1) return;
  let off2 = Math.round(it.offset - dfx * it.span);
  off2 = Math.min(Math.max(off2, 0), it.width - it.span);
  sendInput(name, {offset: off2});
}

function surfCanvas(name) {
  let st = surfState[name];
  if (!st) {
    const div = document.createElement("div");
    div.className = "surface"; div.id = "s_" + name;
    const cv2 = document.createElement("canvas");
    cv2.width = SW; cv2.height = SH;
    const cap = document.createElement("div");
    cap.className = "cap"; cap.textContent = name;
    div.appendChild(cv2); div.appendChild(cap);
    document.getElementById("surfaces").appendChild(div);
    st = surfState[name] = {canvas: cv2, cursor: null};
    cv2.addEventListener("pointermove", (ev) => {
      const r = cv2.getBoundingClientRect();
      const prev = st.cursor;
      st.cursor = [ev.clientX - r.left, ev.clientY - r.top];
      if (st.dragging && prev) {
        const [px, , pw] = plotRect();
        interactivePan(st, name, (st.cursor[0] - prev[0]) / pw);
      }
      drawSurface(name);
    });
    cv2.addEventListener("pointerleave", () => {
      st.cursor = null; st.dragging = false; drawSurface(name);
    });
    cv2.addEventListener("pointerdown", (ev) => {
      if (st.header && st.header.interactive) {
        st.dragging = true; cv2.setPointerCapture(ev.pointerId);
      }
    });
    cv2.addEventListener("pointerup", (ev) => {
      st.dragging = false;
      try { cv2.releasePointerCapture(ev.pointerId); } catch (e) {}
    });
    cv2.addEventListener("wheel", (ev) => {
      if (!(st.header && st.header.interactive)) return;
      ev.preventDefault();
      const r = cv2.getBoundingClientRect();
      const [px, , pw] = plotRect();
      const fx = Math.min(Math.max(
        (ev.clientX - r.left - px) / pw, 0), 1);
      interactiveZoom(st, name, fx, ev.deltaY < 0 ? 1.25 : 0.8);
    }, {passive: false});
  }
  return st;
}

const fmtUnit = (v, unit) => {
  if (unit === "Hz") {
    const a = Math.abs(v);
    if (a >= 1e9) return (v / 1e9).toFixed(3) + " GHz";
    if (a >= 1e6) return (v / 1e6).toFixed(3) + " MHz";
    if (a >= 1e3) return (v / 1e3).toFixed(1) + " kHz";
    return v.toFixed(0) + " Hz";
  }
  if (unit === "dB") return v.toFixed(1) + " dB";
  if (unit === "deg") return v.toFixed(3) + "°";
  return v.toFixed(1) + (unit ? " " + unit : "");
};

// ---- audio: WS PCM chunks -> WebAudio (browsers require a user
// gesture before playback; the speaker button arms the context) ----
const audioState = {ctx: null, t: 0, armed: false, pending: []};
function armAudio() {
  audioState.armed = true;
  if (!audioState.ctx) {
    audioState.ctx = new (window.AudioContext ||
                          window.webkitAudioContext)();
  }
  audioState.ctx.resume();
  const b = document.getElementById("audio-arm");
  if (b) b.classList.add("on");
  for (const [r, p] of audioState.pending.splice(0)) playPcm(r, p);
}
function playPcm(rate, samples) {
  const a = audioState;
  if (!a.armed) {            // keep a short pre-arm backlog
    a.pending.push([rate, samples]);
    if (a.pending.length > 8) a.pending.shift();
    const b = document.getElementById("audio-arm");
    if (b) b.style.display = "";
    return;
  }
  const ctx = a.ctx;
  const buf = ctx.createBuffer(1, samples.length, rate);
  buf.getChannelData(0).set(samples);
  const src = ctx.createBufferSource();
  src.buffer = buf;
  src.connect(ctx.destination);
  // rolling schedule: butt chunks against each other; resync after
  // an underrun (scheduled time fell behind the clock)
  if (a.t < ctx.currentTime + 0.02) a.t = ctx.currentTime + 0.05;
  src.start(a.t);
  a.t += buf.duration;
}

async function presentSurface(header, payload) {
  if (header.kind === "audio") {
    playPcm(header.rate || 48000, new Float32Array(payload));
    return;
  }
  const st = surfCanvas(header.name);
  st.header = header;
  if (header.enc === "f32") {
    st.data = new Float32Array(payload);
  } else if (header.enc === "jpeg" || header.enc === "png") {
    const bm = await createImageBitmap(new Blob([payload],
      {type: header.enc === "png" ? "image/png" : "image/jpeg"}));
    if (header.mode === "delta") {
      if (!st.off || st.off.width !== bm.width) return; // need key
      // scrolling delta: shift retained frame up, blit new rows at
      // the bottom (server sends only the newly scrolled strip)
      const g2 = st.off.getContext("2d");
      g2.drawImage(st.off, 0, -bm.height);
      g2.drawImage(bm, 0, st.off.height - bm.height);
      st.bitmap = st.off;
    } else if (header.mode) {             // keyframe (or lost sync)
      if (!st.off || st.off.width !== bm.width ||
          st.off.height !== bm.height) {
        st.off = document.createElement("canvas");
        st.off.width = bm.width; st.off.height = bm.height;
      }
      st.off.getContext("2d").drawImage(bm, 0, 0);
      st.bitmap = st.off;
    } else {
      st.bitmap = bm;
    }
  }
  drawSurface(header.name);
}

function plotRect() {
  return [MARGIN.l, MARGIN.t, SW - MARGIN.l - MARGIN.r,
          SH - MARGIN.t - MARGIN.b];
}

function drawAxes(g, axes, nv, nh) {
  const [px, py, pw, ph] = plotRect();
  g.strokeStyle = "#2a2e36"; g.fillStyle = "#8a8f98";
  g.font = "10px ui-monospace"; g.lineWidth = 1;
  const x = axes && axes.x, y = axes && axes.y;
  for (let i = 0; i < nv; i++) {
    const fx = i / (nv - 1), gx = px + fx * pw;
    g.beginPath(); g.moveTo(gx, py); g.lineTo(gx, py + ph); g.stroke();
    if (x && (i === 0 || i === nv - 1 || i === (nv - 1) / 2)) {
      const v = x.min + fx * (x.max - x.min);
      g.textAlign = i === 0 ? "left" : (i === nv - 1 ? "right"
        : "center");
      g.fillText(fmtUnit(v, x.unit), gx, SH - 8);
    }
  }
  for (let i = 0; i < nh; i++) {
    const fy = i / (nh - 1), gy = py + fy * ph;
    g.beginPath(); g.moveTo(px, gy); g.lineTo(px + pw, gy); g.stroke();
    if (y) {
      const v = y.max - fy * (y.max - y.min);
      g.textAlign = "right";
      g.fillText(fmtUnit(v, y.unit), px - 4, gy + 3);
    }
  }
  g.strokeStyle = "#40454f";
  g.strokeRect(px, py, pw, ph);
}

function cursorReadout(g, st, toData) {
  if (!st.cursor) return;
  const [cx, cy] = st.cursor;
  const [px, py, pw, ph] = plotRect();
  if (cx < px || cx > px + pw || cy < py || cy > py + ph) return;
  g.strokeStyle = "#ffc85788"; g.lineWidth = 1;
  g.beginPath(); g.moveTo(cx, py); g.lineTo(cx, py + ph); g.stroke();
  g.beginPath(); g.moveTo(px, cy); g.lineTo(px + pw, cy); g.stroke();
  const txt = toData((cx - px) / pw, (cy - py) / ph);
  g.font = "11px ui-monospace"; g.textAlign = "left";
  const tw = g.measureText(txt).width + 8;
  const bx = Math.min(cx + 8, px + pw - tw);
  g.fillStyle = "#000000aa"; g.fillRect(bx, py + 4, tw, 15);
  g.fillStyle = "#ffc857"; g.fillText(txt, bx + 4, py + 15);
}

function drawSurface(name) {
  const st = surfState[name];
  if (!st || !st.header) return;
  const g = st.canvas.getContext("2d");
  const h = st.header, axes = h.axes;
  g.fillStyle = "#0d0f12"; g.fillRect(0, 0, SW, SH);
  const [px, py, pw, ph] = plotRect();
  if (h.kind === "lineplot" && st.data) {
    const grid = h.grid || [11, 5];
    drawAxes(g, axes, grid[0], grid[1]);
    g.strokeStyle = "#4cc2ff"; g.lineWidth = h.thickness || 1.2;
    g.beginPath();
    const n = st.data.length;
    for (let i = 0; i < n; i++) {
      const v = Math.min(Math.max(st.data[i], 0), 1);
      const gx = px + (i / (n - 1)) * pw, gy = py + (1 - v) * ph;
      i ? g.lineTo(gx, gy) : g.moveTo(gx, gy);
    }
    g.stroke();
    cursorReadout(g, st, (fx, fy) => {
      const i = Math.min(Math.round(fx * (n - 1)), n - 1);
      const xv = axes ? axes.x.min + fx * (axes.x.max - axes.x.min)
        : i;
      const yv = axes ? axes.y.min + st.data[i]
        * (axes.y.max - axes.y.min) : st.data[i];
      return `${fmtUnit(xv, axes ? axes.x.unit : "")}  ` +
        `${fmtUnit(yv, axes ? axes.y.unit : "")}`;
    });
  } else if (h.kind === "map") {
    drawMap(g, st);
  } else if (st.bitmap) {
    g.drawImage(st.bitmap, px, py, pw, ph);
    const nv = 5, nh = 2;
    if (h.kind === "waterfall" || h.kind === "spectrogram") {
      g.strokeStyle = "#40454f"; g.strokeRect(px, py, pw, ph);
      g.fillStyle = "#8a8f98"; g.font = "10px ui-monospace";
      for (let i = 0; i < nv; i++) {
        const fx = i / (nv - 1), gx = px + fx * pw;
        g.beginPath(); g.moveTo(gx, py + ph);
        g.lineTo(gx, py + ph + 4); g.strokeStyle = "#8a8f98";
        g.stroke();
        if (axes && (i === 0 || i === nv - 1 || i * 2 === nv - 1)) {
          const v = axes.x.min + fx * (axes.x.max - axes.x.min);
          g.textAlign = i === 0 ? "left"
            : (i === nv - 1 ? "right" : "center");
          g.fillText(fmtUnit(v, axes.x.unit), gx, SH - 8);
        }
      }
      cursorReadout(g, st, (fx, fy) => {
        const xv = axes ? axes.x.min + fx * (axes.x.max - axes.x.min)
          : fx;
        return fmtUnit(xv, axes ? axes.x.unit : "");
      });
    } else {
      g.strokeStyle = "#40454f"; g.strokeRect(px, py, pw, ph);
      if (h.kind === "constellation") {
        g.strokeStyle = "#2a2e36";
        g.beginPath(); g.moveTo(px + pw / 2, py);
        g.lineTo(px + pw / 2, py + ph); g.stroke();
        g.beginPath(); g.moveTo(px, py + ph / 2);
        g.lineTo(px + pw, py + ph / 2); g.stroke();
        g.fillStyle = "#8a8f98"; g.font = "10px ui-monospace";
        g.textAlign = "left"; g.fillText("I", px + pw - 10, py + ph / 2 - 4);
        g.fillText("Q", px + pw / 2 + 4, py + 10);
        cursorReadout(g, st, (fx, fy) =>
          `I ${(fx * 3 - 1.5).toFixed(2)}  Q ${(1.5 - fy * 3).toFixed(2)}`);
      }
    }
  }
}

// coarse world coastline (lon,lat polylines) for the geomap backdrop —
// deliberately low-res; the reference ships full geodata
// (resources/geodata + render/components geomap)
const COAST = [
  [[-165,60],[-150,59],[-131,54],[-125,48],[-124,40],[-117,33],
   [-110,24],[-105,20],[-97,16],[-90,14],[-83,9],[-77,7],[-81,25],
   [-80,32],[-75,35],[-70,43],[-60,47],[-55,52],[-65,60],[-78,62],
   [-85,66],[-110,68],[-130,70],[-156,71],[-165,60]],
  [[-77,7],[-79,0],[-81,-5],[-75,-15],[-70,-20],[-71,-30],[-73,-40],
   [-74,-50],[-68,-55],[-65,-50],[-62,-40],[-58,-34],[-48,-28],
   [-40,-22],[-35,-8],[-50,0],[-60,5],[-64,10],[-72,11],[-77,7]],
  [[-17,15],[-16,22],[-10,31],[-6,35],[10,37],[20,32],[32,31],
   [43,12],[51,12],[40,-5],[35,-20],[20,-35],[12,-18],[9,-1],
   [-8,5],[-17,15]],
  [[-10,36],[-9,44],[0,47],[4,52],[8,54],[12,56],[20,60],[30,60],
   [40,67],[60,69],[90,73],[110,73],[140,72],[160,70],[170,66],
   [162,59],[156,51],[142,46],[130,42],[122,39],[121,31],[110,20],
   [105,10],[103,1],[98,8],[92,22],[88,22],[80,13],[72,19],[67,24],
   [57,25],[48,30],[35,36],[30,31],[20,32],[10,37],[-6,35],[-10,36]],
  [[115,-21],[113,-26],[115,-34],[129,-32],[138,-35],[147,-38],
   [153,-28],[146,-19],[142,-11],[136,-12],[132,-11],[122,-17],
   [115,-21]],
  [[-43,60],[-52,66],[-55,72],[-45,78],[-25,71],[-32,68],[-40,65],
   [-43,60]],
];

function drawMap(g, st) {
  const h = st.header;
  const [px, py, pw, ph] = plotRect();
  const located = (h.aircraft || []).filter(
    a => a.lat !== null && a.lon !== null);
  let lat0 = 0, lon0 = 0, span = 90;
  if (located.length) {
    lat0 = located.reduce((s, a) => s + a.lat, 0) / located.length;
    lon0 = located.reduce((s, a) => s + a.lon, 0) / located.length;
    span = Math.max(0.5, ...located.map(a =>
      Math.max(Math.abs(a.lat - lat0), Math.abs(a.lon - lon0)))) * 1.4;
  }
  const toXY = (lon, lat) => [
    px + ((lon - (lon0 - span * pw / ph)) / (2 * span * pw / ph)) * pw,
    py + ((lat0 + span - lat) / (2 * span)) * ph];
  // graticule
  g.strokeStyle = "#23272e"; g.lineWidth = 1;
  const step = span > 40 ? 30 : (span > 8 ? 10 : (span > 2 ? 1 : 0.5));
  for (let lo = Math.floor((lon0 - span * 3) / step) * step;
       lo <= lon0 + span * 3; lo += step) {
    const [x1, y1] = toXY(lo, lat0 - span), [x2, y2] =
      toXY(lo, lat0 + span);
    g.beginPath(); g.moveTo(x1, y1); g.lineTo(x2, y2); g.stroke();
  }
  for (let la = Math.floor((lat0 - span) / step) * step;
       la <= lat0 + span; la += step) {
    const [x1, y1] = toXY(lon0 - span * 3, la), [x2, y2] =
      toXY(lon0 + span * 3, la);
    g.beginPath(); g.moveTo(x1, y1); g.lineTo(x2, y2); g.stroke();
  }
  // coastline backdrop
  g.strokeStyle = "#3a5f46"; g.lineWidth = 1;
  g.save(); g.beginPath(); g.rect(px, py, pw, ph); g.clip();
  for (const line of COAST) {
    g.beginPath();
    line.forEach(([lo, la], i) => {
      const [x, y] = toXY(lo, la);
      i ? g.lineTo(x, y) : g.moveTo(x, y);
    });
    g.stroke();
  }
  // aircraft markers with heading vectors + callsign labels
  for (const a of located) {
    const [x, y] = toXY(a.lon, a.lat);
    g.fillStyle = "#51d88a";
    g.beginPath(); g.arc(x, y, 3, 0, 6.3); g.fill();
    if (a.heading_deg !== null && a.heading_deg !== undefined) {
      const r = a.heading_deg * Math.PI / 180;
      g.strokeStyle = "#ffc857"; g.lineWidth = 1.5;
      g.beginPath(); g.moveTo(x, y);
      g.lineTo(x + 9 * Math.sin(r), y - 9 * Math.cos(r)); g.stroke();
    }
    g.fillStyle = "#d6d9de"; g.font = "10px ui-monospace";
    g.textAlign = "left";
    const lbl = (a.callsign || a.icao || "") +
      (a.altitude_ft ? ` ${Math.round(a.altitude_ft / 100)}FL` : "");
    g.fillText(lbl, x + 6, y - 5);
  }
  g.restore();
  g.strokeStyle = "#40454f"; g.strokeRect(px, py, pw, ph);
  const stats = h.stats || {};
  g.fillStyle = "#8a8f98"; g.font = "10px ui-monospace";
  g.textAlign = "left";
  g.fillText(`${located.length}/${(h.aircraft || []).length} aircraft` +
    (stats.df17 !== undefined ? `  df17:${stats.df17}` : ""),
    px + 4, SH - 8);
  cursorReadout(g, st, (fx, fy) => {
    const lon = (lon0 - span * pw / ph) + fx * 2 * span * pw / ph;
    const lat = (lat0 + span) - fy * 2 * span;
    return `${lat.toFixed(3)}° ${lon.toFixed(3)}°`;
  });
  aircraftTable(st, h.aircraft || []);
}

// aircraft TEXT GRID under the map (the reference's Sakura text-grid/
// table widget; the flight tracker lists aircraft beside the map)
function aircraftTable(st, aircraft) {
  if (!st.table) {
    st.table = document.createElement("table");
    st.table.className = "acgrid";
    st.canvas.parentElement.insertBefore(
      st.table, st.canvas.nextSibling);
  }
  const rows = aircraft.slice(0, 12).map(a =>
    `<tr><td>${a.icao || ""}</td><td>${a.callsign || ""}</td>` +
    `<td>${a.altitude_ft != null ? Math.round(a.altitude_ft) : ""}` +
    `</td><td>${a.speed_kt != null ? Math.round(a.speed_kt) : ""}` +
    `</td><td>${a.heading_deg != null ?
      Math.round(a.heading_deg) + "°" : ""}</td>` +
    `<td>${a.lat != null ? a.lat.toFixed(3) : ""}</td>` +
    `<td>${a.lon != null ? a.lon.toFixed(3) : ""}</td>` +
    `<td>${a.messages != null ? a.messages : ""}</td></tr>`).join("");
  st.table.innerHTML =
    "<tr><th>icao</th><th>call</th><th>alt ft</th><th>kt</th>" +
    "<th>hdg</th><th>lat</th><th>lon</th><th>msgs</th></tr>" + rows;
}
boot();
</script></body></html>"""
