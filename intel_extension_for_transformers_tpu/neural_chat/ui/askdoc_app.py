"""AskDoc RAG frontend: upload → index → ask → cited answers.

The browser leg of the askdoc workflow (reference: the askdoc gradio demos
under workflows/chatbot and the retrieval router restful/retrieval_api.py) —
exercises POST /v1/askdoc/create|append|chat and GET /v1/askdoc/kbs
end-to-end from a dependency-free single page served at GET /askdoc:

- **build a knowledge base** from dropped/picked text files (read client-side,
  shipped as {documents: [{content, metadata.source}]}) or pasted text
- **KB picker** refreshed from /v1/askdoc/kbs; append more docs to the
  selected KB
- **ask**: answers render as markdown; the retrieved context chunks show in
  a citations panel with their source metadata, and inline [n] markers link
  the answer to its evidence
"""

ASKDOC_APP_HTML = r"""<!doctype html>
<html>
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>AskDoc · NeuralChat TPU</title>
<style>
  :root { color-scheme: light dark;
          --edge: #8884; --accent: #3b82f6; }
  * { box-sizing: border-box; }
  body { font-family: system-ui, sans-serif; margin: 0; height: 100vh;
         display: grid; grid-template-columns: 290px 1fr 320px; }
  h1 { font-size: 1rem; margin: 0 0 .4rem; }
  #side, #cites { padding: .8rem; overflow-y: auto; font-size: .85rem; }
  #side { border-right: 1px solid var(--edge); display: flex;
          flex-direction: column; gap: .6rem; }
  #cites { border-left: 1px solid var(--edge); }
  #drop { border: 2px dashed var(--edge); border-radius: 8px;
          padding: 1rem .6rem; text-align: center; cursor: pointer;
          opacity: .8; }
  #drop.hot { border-color: var(--accent); opacity: 1; }
  textarea { width: 100%; min-height: 4.5rem; font-size: .8rem;
             border: 1px solid var(--edge); border-radius: 6px;
             background: transparent; color: inherit; }
  select, input[type=number] { padding: .25rem .4rem; border-radius: 6px;
          border: 1px solid var(--edge); background: transparent;
          color: inherit; width: 100%; }
  button { padding: .45rem .9rem; border-radius: 8px; border: 0;
           background: var(--accent); color: white; cursor: pointer; }
  button:disabled { opacity: .4; cursor: default; }
  .ghost { background: #8886; }
  #status { font-size: .75rem; opacity: .7; min-height: 1.1em; }
  #main { display: flex; flex-direction: column; height: 100vh; }
  #log { flex: 1; overflow-y: auto; padding: 1rem 1.5rem; }
  .msg { max-width: 52rem; margin: .6rem auto; padding: .6rem .9rem;
         border-radius: 10px; line-height: 1.45; }
  .user { background: #3b82f622; }
  .assistant { border: 1px solid var(--edge); }
  .msg .who { font-size: .7rem; opacity: .6; margin-bottom: .2rem; }
  .msg pre { background: #8882; padding: .6rem; border-radius: 6px;
             overflow-x: auto; }
  .msg code { background: #8882; padding: .05rem .3rem; border-radius: 4px; }
  #bar { display: flex; gap: .5rem; padding: .8rem 1.5rem;
         border-top: 1px solid var(--edge); }
  #q { flex: 1; padding: .6rem .8rem; border-radius: 8px;
       border: 1px solid var(--edge); background: transparent;
       color: inherit; font-size: 1rem; }
  .cite { border: 1px solid var(--edge); border-radius: 8px;
          padding: .5rem .6rem; margin-bottom: .6rem; }
  .cite .src { font-size: .7rem; opacity: .65; margin-bottom: .25rem; }
  .cite .txt { font-size: .78rem; white-space: pre-wrap; max-height: 9rem;
               overflow-y: auto; }
  .mark { color: var(--accent); font-weight: 600; }
  a { color: var(--accent); font-size: .8rem; }
</style>
</head>
<body>
<div id="side">
  <h1>AskDoc · RAG</h1>
  <label>knowledge base
    <select id="kb"><option value="">(new)</option></select></label>
  <div id="drop">drop .txt/.md files here<br>or click to pick</div>
  <input type="file" id="pick" multiple accept=".txt,.md,.rst,.py,.json"
         style="display:none">
  <textarea id="paste" placeholder="…or paste document text"></textarea>
  <button id="build">Index documents</button>
  <label>top_k <input type="number" id="topk" value="3" min="1" max="10"></label>
  <label><input type="checkbox" id="gen" checked> generate answer</label>
  <div id="status"></div>
  <a href="/">← chat</a>
</div>
<div id="main">
  <div id="log"></div>
  <div id="bar">
    <input id="q" placeholder="Ask the documents…" autocomplete="off" autofocus>
    <button id="send">Ask</button>
  </div>
</div>
<div id="cites"><h1>Citations</h1><div id="citelist"></div></div>
<script>
"use strict";
const $ = (id) => document.getElementById(id);
function esc(s) {
  return s.replace(/&/g, "&amp;").replace(/</g, "&lt;").replace(/>/g, "&gt;");
}
function inline(s) {
  return esc(s)
    .replace(/`([^`]+)`/g, "<code>$1</code>")
    .replace(/\*\*([^*]+)\*\*/g, "<b>$1</b>")
    .replace(/\[(\d+)\]/g, '<span class="mark">[$1]</span>');
}
function markdown(src) {
  return src.split("\n\n").map(p => "<p>" + inline(p).replace(/\n/g, "<br>")
                               + "</p>").join("");
}
function addMsg(role, html) {
  const div = document.createElement("div");
  div.className = "msg " + role;
  div.innerHTML = '<div class="who">' + (role === "user" ? "you" : "assistant")
      + '</div><div class="body">' + html + "</div>";
  $("log").appendChild(div);
  $("log").scrollTop = $("log").scrollHeight;
  return div.querySelector(".body");
}
function status(t) { $("status").textContent = t; }

// ------------------------------ KB handling ------------------------------
let pendingDocs = [];
async function refreshKbs(selectId) {
  try {
    const d = await (await fetch("/v1/askdoc/kbs")).json();
    const sel = $("kb");
    sel.innerHTML = '<option value="">(new)</option>';
    for (const kb of (d.knowledge_bases || [])) {
      const o = document.createElement("option");
      o.value = kb.id;
      o.textContent = `${kb.id} (${kb.count} chunks)`;
      sel.appendChild(o);
    }
    if (selectId) sel.value = selectId;
  } catch {}
}
function takeFiles(files) {
  for (const f of files) {
    const reader = new FileReader();
    reader.onload = () => {
      pendingDocs.push({content: reader.result,
                        metadata: {source: f.name}});
      status(`${pendingDocs.length} file(s) staged`);
    };
    reader.readAsText(f);
  }
}
$("drop").onclick = () => $("pick").click();
$("pick").onchange = (e) => takeFiles(e.target.files);
$("drop").ondragover = (e) => { e.preventDefault();
                                $("drop").classList.add("hot"); };
$("drop").ondragleave = () => $("drop").classList.remove("hot");
$("drop").ondrop = (e) => { e.preventDefault();
  $("drop").classList.remove("hot"); takeFiles(e.dataTransfer.files); };

$("build").onclick = async () => {
  const docs = pendingDocs.slice();
  const pasted = $("paste").value.trim();
  if (pasted) docs.push({content: pasted, metadata: {source: "pasted"}});
  if (!docs.length) { status("nothing to index"); return; }
  $("build").disabled = true;
  status("indexing…");
  const kb = $("kb").value;
  const url = kb ? "/v1/askdoc/append" : "/v1/askdoc/create";
  const body = kb ? {knowledge_base_id: kb, documents: docs}
                  : {documents: docs};
  try {
    const r = await fetch(url, {method: "POST",
      headers: {"Content-Type": "application/json"},
      body: JSON.stringify(body)});
    const d = await r.json();
    if (!r.ok) throw new Error(d.error || r.status);
    pendingDocs = []; $("paste").value = "";
    status(`indexed → ${d.knowledge_base_id} (${d.count} chunks)`);
    await refreshKbs(d.knowledge_base_id);
  } catch (e) { status("error: " + e.message); }
  $("build").disabled = false;
};

// --------------------------------- ask ---------------------------------
function renderCites(ctx) {
  const box = $("citelist");
  box.innerHTML = "";
  ctx.forEach((c, i) => {
    const d = document.createElement("div");
    d.className = "cite";
    d.innerHTML = '<div class="src"><span class="mark">[' + (i + 1)
      + ']</span> ' + esc(c.metadata?.source || "document") + "</div>"
      + '<div class="txt">' + esc(c.content) + "</div>";
    box.appendChild(d);
  });
}
$("send").onclick = async () => {
  const text = $("q").value.trim();
  const kb = $("kb").value;
  if (!text) return;
  if (!kb) { status("build / pick a knowledge base first"); return; }
  $("q").value = "";
  addMsg("user", esc(text));
  const bodyEl = addMsg("assistant", "<i>retrieving…</i>");
  $("send").disabled = true;
  try {
    const r = await fetch("/v1/askdoc/chat", {method: "POST",
      headers: {"Content-Type": "application/json"},
      body: JSON.stringify({query: text, knowledge_base_id: kb,
                            top_k: parseInt($("topk").value) || 3,
                            generate: $("gen").checked})});
    const d = await r.json();
    if (!r.ok) throw new Error(d.error || r.status);
    renderCites(d.context || []);
    const refs = (d.context || []).map((c, i) => "[" + (i + 1) + "]").join(" ");
    bodyEl.innerHTML = d.response !== undefined
      ? markdown(d.response) + '<p style="opacity:.6">sources: '
        + refs + "</p>"
      : "<p><i>retrieved " + (d.context || []).length
        + " context chunk(s) — see citations panel</i> " + refs + "</p>";
  } catch (e) { bodyEl.innerHTML = "<i>error: " + esc(e.message) + "</i>"; }
  $("send").disabled = false;
};
$("q").addEventListener("keydown", (e) => {
  if (e.key === "Enter") { e.preventDefault(); $("send").onclick(); }
});
refreshKbs();
</script>
</body>
</html>
"""
