"""Full-featured single-page chat frontend (no build step, no dependencies).

Functional parity with the reference's Gradio basic app
(reference: neural_chat/ui/gradio/basic/app.py:1 — chat history, streaming,
regenerate/clear, parameter sliders, model picker) plus the side-by-side
compare (ui/gradio/side_by_side). Gradio/Svelte are not in this
environment, so everything is one HTML document served by the stdlib server
at GET /:

- **streaming markdown**: deltas from /v1/chat/completions SSE render
  through a small sanitizing markdown formatter (code fences, inline code,
  bold/italic, headings, lists, links) as they arrive
- **stop button**: AbortController cancels the fetch mid-stream, which
  drops the SSE socket and exercises the engine's slot-cancellation path
- **sessions**: multiple conversations with localStorage persistence,
  new/switch/delete, auto-titled from the first prompt
- **controls**: model picker (GET /v1/models), system prompt, temperature /
  top_p / top_k / max_tokens sliders, regenerate last answer
- **stats footer**: polls /v1/stats (engine slots, tokens, kv policy)
"""

CHAT_APP_HTML = r"""<!doctype html>
<html>
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>NeuralChat TPU</title>
<style>
  :root { color-scheme: light dark;
          --edge: #8884; --accent: #3b82f6; --accent2: #d33; }
  * { box-sizing: border-box; }
  body { font-family: system-ui, sans-serif; margin: 0; height: 100vh;
         display: grid; grid-template-columns: 230px 1fr; }
  /* ---- sidebar ---- */
  #side { border-right: 1px solid var(--edge); padding: .8rem;
          display: flex; flex-direction: column; gap: .5rem;
          overflow-y: auto; }
  #side h1 { font-size: 1rem; margin: 0 0 .4rem; }
  #newchat { width: 100%; }
  .sess { padding: .4rem .5rem; border-radius: 6px; cursor: pointer;
          font-size: .85rem; white-space: nowrap; overflow: hidden;
          text-overflow: ellipsis; display: flex; }
  .sess.cur { background: #8882; }
  .sess span { flex: 1; overflow: hidden; text-overflow: ellipsis; }
  .sess b { opacity: .4; cursor: pointer; padding: 0 .2rem; }
  #controls { margin-top: auto; font-size: .8rem; display: flex;
              flex-direction: column; gap: .35rem; }
  #controls label { display: flex; justify-content: space-between;
                    gap: .4rem; align-items: center; }
  #controls input[type=number], #controls select {
      width: 6.2rem; padding: .15rem .3rem; border: 1px solid var(--edge);
      border-radius: 4px; background: transparent; color: inherit; }
  #controls textarea { width: 100%; min-height: 3rem; font-size: .8rem;
      border: 1px solid var(--edge); border-radius: 4px;
      background: transparent; color: inherit; }
  #stats { font-size: .7rem; opacity: .65; line-height: 1.5; }
  a { color: var(--accent); font-size: .8rem; }
  /* ---- main ---- */
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
  .msg pre code { background: none; padding: 0; }
  .msg h1, .msg h2, .msg h3 { font-size: 1.05rem; margin: .5rem 0 .2rem; }
  .msg ul { margin: .3rem 0; padding-left: 1.4rem; }
  #bar { display: flex; gap: .5rem; padding: .8rem 1.5rem;
         border-top: 1px solid var(--edge); }
  #q { flex: 1; padding: .6rem .8rem; border-radius: 8px;
       border: 1px solid var(--edge); background: transparent;
       color: inherit; font-size: 1rem; }
  button { padding: .5rem 1rem; border-radius: 8px; border: 0;
           background: var(--accent); color: white; cursor: pointer; }
  button:disabled { opacity: .4; cursor: default; }
  #stop { background: var(--accent2); display: none; }
  #regen { background: #8886; }
</style>
</head>
<body>
<div id="side">
  <h1>NeuralChat · TPU</h1>
  <button id="newchat">+ New chat</button>
  <div id="sessions"></div>
  <div id="controls">
    <label>model <select id="model"></select></label>
    <label>temperature <input type="number" id="temp" step="0.1" value="1.0"></label>
    <label>top_p <input type="number" id="top_p" step="0.05" value="1.0"></label>
    <label>top_k <input type="number" id="top_k" step="1" value="0"></label>
    <label>max tokens <input type="number" id="maxtok" step="16" value="256"></label>
    <label>sample <input type="checkbox" id="sample"></label>
    <textarea id="system" placeholder="system prompt (optional)"></textarea>
    <a href="/compare">side-by-side compare →</a>
    <a href="/askdoc">askdoc / RAG →</a>
    <div id="stats"></div>
  </div>
</div>
<div id="main">
  <div id="log"></div>
  <div id="bar">
    <input id="q" placeholder="Ask something…" autocomplete="off" autofocus>
    <button id="send">Send</button>
    <button id="regen" title="regenerate last answer">↻</button>
    <button id="stop">Stop</button>
  </div>
</div>
<script>
"use strict";
// ------------------------- tiny sanitizing markdown -------------------------
function esc(s) {
  return s.replace(/&/g, "&amp;").replace(/</g, "&lt;").replace(/>/g, "&gt;");
}
function inline(s) {
  return esc(s)
    .replace(/`([^`]+)`/g, "<code>$1</code>")
    .replace(/\*\*([^*]+)\*\*/g, "<b>$1</b>")
    .replace(/\*([^*]+)\*/g, "<i>$1</i>")
    .replace(/\[([^\]]+)\]\((https?:[^)\s"'<>]+)\)/g,
             '<a href="$2" target="_blank" rel="noopener">$1</a>');
}
function markdown(src) {
  const out = [];
  const lines = src.split("\n");
  let i = 0, inList = false;
  while (i < lines.length) {
    const l = lines[i];
    const fence = l.match(/^```(\w*)/);
    if (fence) {
      const code = [];
      i++;
      while (i < lines.length && !lines[i].startsWith("```")) code.push(lines[i++]);
      i++;  // closing fence (or EOF mid-stream)
      if (inList) { out.push("</ul>"); inList = false; }
      out.push("<pre><code>" + esc(code.join("\n")) + "</code></pre>");
      continue;
    }
    const li = l.match(/^\s*[-*]\s+(.*)/);
    if (li) {
      if (!inList) { out.push("<ul>"); inList = true; }
      out.push("<li>" + inline(li[1]) + "</li>"); i++; continue;
    }
    if (inList) { out.push("</ul>"); inList = false; }
    const h = l.match(/^(#{1,3})\s+(.*)/);
    if (h) { out.push("<h" + h[1].length + ">" + inline(h[2]) +
                      "</h" + h[1].length + ">"); i++; continue; }
    out.push(inline(l) + (i < lines.length - 1 ? "<br>" : ""));
    i++;
  }
  if (inList) out.push("</ul>");
  return out.join("");
}

// ------------------------------- sessions -------------------------------
const store = {
  load() { try { return JSON.parse(localStorage.nc_sessions || "[]"); }
           catch { return []; } },
  save(s) { localStorage.nc_sessions = JSON.stringify(s); },
};
let sessions = store.load();
if (!sessions.length) sessions = [{title: "New chat", history: []}];
let cur = 0;
const $ = (id) => document.getElementById(id);

function renderSessions() {
  const box = $("sessions");
  box.innerHTML = "";
  sessions.forEach((s, i) => {
    const d = document.createElement("div");
    d.className = "sess" + (i === cur ? " cur" : "");
    const name = document.createElement("span");
    name.textContent = s.title;
    const del = document.createElement("b");
    del.textContent = "✕";
    del.onclick = (e) => { e.stopPropagation(); sessions.splice(i, 1);
      if (!sessions.length) sessions = [{title: "New chat", history: []}];
      cur = Math.min(cur, sessions.length - 1);
      store.save(sessions); renderSessions(); renderLog(); };
    d.onclick = () => { cur = i; renderSessions(); renderLog(); };
    d.append(name, del);
    box.appendChild(d);
  });
}
function addMsg(role, text) {
  const div = document.createElement("div");
  div.className = "msg " + role;
  div.innerHTML = '<div class="who">' + (role === "user" ? "you" : "assistant")
      + '</div><div class="body">' + markdown(text) + "</div>";
  $("log").appendChild(div);
  $("log").scrollTop = $("log").scrollHeight;
  return div.querySelector(".body");
}
function renderLog() {
  $("log").innerHTML = "";
  for (const m of sessions[cur].history) addMsg(m.role, m.content);
}

// ------------------------------ streaming ------------------------------
let aborter = null;
async function ask(history, bodyEl) {
  aborter = new AbortController();
  $("stop").style.display = "inline-block";
  $("send").disabled = true;
  let answer = "";
  try {
    const body = {
      messages: (sys() ? [{role: "system", content: sys()}] : []).concat(history),
      stream: true,
      model: $("model").value || undefined,
      temperature: parseFloat($("temp").value),
      top_p: parseFloat($("top_p").value),
      top_k: parseInt($("top_k").value) || 0,
      max_tokens: parseInt($("maxtok").value) || 256,
      do_sample: $("sample").checked,
    };
    const resp = await fetch("/v1/chat/completions", {
      method: "POST", headers: {"Content-Type": "application/json"},
      body: JSON.stringify(body), signal: aborter.signal,
    });
    const reader = resp.body.getReader();
    const dec = new TextDecoder();
    let buf = "";
    for (;;) {
      const {done, value} = await reader.read();
      if (done) break;
      buf += dec.decode(value, {stream: true});
      const lines = buf.split("\n");
      buf = lines.pop();
      for (const line of lines) {
        if (!line.startsWith("data: ")) continue;
        const payload = line.slice(6).trim();
        if (payload === "[DONE]") continue;
        try {
          const delta = JSON.parse(payload).choices?.[0]?.delta?.content;
          if (delta) { answer += delta; bodyEl.innerHTML = markdown(answer);
                       $("log").scrollTop = $("log").scrollHeight; }
        } catch {}
      }
    }
  } catch (e) { /* aborted or network — keep partial answer */ }
  $("stop").style.display = "none";
  $("send").disabled = false;
  aborter = null;
  return answer;
}
function sys() { return $("system").value.trim(); }

async function send(text) {
  const s = sessions[cur];
  if (!s.history.length) { s.title = text.slice(0, 28); renderSessions(); }
  s.history.push({role: "user", content: text});
  addMsg("user", text);
  const bodyEl = addMsg("assistant", "");
  const answer = await ask(s.history, bodyEl);
  s.history.push({role: "assistant", content: answer});
  store.save(sessions);
}

$("send").onclick = () => {
  const t = $("q").value.trim();
  if (!t || aborter) return;
  $("q").value = "";
  send(t);
};
$("q").addEventListener("keydown", (e) => {
  if (e.key === "Enter") { e.preventDefault(); $("send").onclick(); }
});
$("stop").onclick = () => aborter && aborter.abort();
$("regen").onclick = async () => {
  const s = sessions[cur];
  if (aborter || !s.history.length) return;
  if (s.history[s.history.length - 1].role === "assistant") s.history.pop();
  renderLog();
  const bodyEl = addMsg("assistant", "");
  const answer = await ask(s.history, bodyEl);
  s.history.push({role: "assistant", content: answer});
  store.save(sessions);
};
$("newchat").onclick = () => {
  sessions.unshift({title: "New chat", history: []});
  cur = 0; store.save(sessions); renderSessions(); renderLog();
};

// ------------------------------ model list ------------------------------
fetch("/v1/models").then(r => r.json()).then(d => {
  const sel = $("model");
  for (const m of (d.data || [])) {
    const o = document.createElement("option");
    o.value = o.textContent = m.id;
    sel.appendChild(o);
  }
}).catch(() => {});

// ------------------------------ stats poll ------------------------------
async function pollStats() {
  try {
    const d = await (await fetch("/v1/stats")).json();
    const e = d.engine || {};
    $("stats").textContent = e.max_slots !== undefined
      ? `slots ${e.active_slots}/${e.max_slots} · ${e.total_tokens} tokens · ` +
        `${e.completed_requests} reqs · kv ${e.kv_dtype}/${e.kv_policy || "none"}`
      : "";
  } catch {}
  setTimeout(pollStats, 4000);
}
pollStats();

renderSessions();
renderLog();
</script>
</body>
</html>
"""
