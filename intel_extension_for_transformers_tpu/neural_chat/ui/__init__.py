"""Built-in browser chat UI.

The L7 analogue of the reference's Gradio frontends
(reference: neural_chat/ui/gradio/{basic,side_by_side}). Gradio is not in
this environment, so the UI is a single dependency-free HTML page served by
the stdlib server at GET / — it streams from /v1/chat/completions via
fetch + SSE parsing, keeps the conversation client-side, and needs no build
step or extra process.
"""

CHAT_HTML = """<!doctype html>
<html>
<head>
<meta charset="utf-8">
<title>NeuralChat TPU</title>
<style>
  :root { color-scheme: light dark; }
  body { font-family: system-ui, sans-serif; max-width: 720px;
         margin: 2rem auto; padding: 0 1rem; }
  h1 { font-size: 1.2rem; }
  #log { border: 1px solid #8884; border-radius: 8px; padding: 1rem;
         min-height: 300px; }
  .msg { margin: .5rem 0; white-space: pre-wrap; }
  .user { font-weight: 600; }
  .assistant { opacity: .9; }
  form { display: flex; gap: .5rem; margin-top: 1rem; }
  input { flex: 1; padding: .6rem; border-radius: 6px;
          border: 1px solid #8886; }
  button { padding: .6rem 1.2rem; border-radius: 6px; border: 0;
           background: #3b6; color: white; cursor: pointer; }
</style>
</head>
<body>
<h1>NeuralChat &middot; TPU-native GenAI toolkit</h1>
<div id="log"></div>
<form id="f">
  <input id="q" placeholder="Ask something..." autocomplete="off" autofocus>
  <button>Send</button>
</form>
<script>
const log = document.getElementById("log");
const history = [];
function add(role, text) {
  const div = document.createElement("div");
  div.className = "msg " + role;
  div.textContent = (role === "user" ? "you: " : "bot: ") + text;
  log.appendChild(div);
  log.scrollTop = log.scrollHeight;
  return div;
}
document.getElementById("f").addEventListener("submit", async (e) => {
  e.preventDefault();
  const q = document.getElementById("q");
  const text = q.value.trim();
  if (!text) return;
  q.value = "";
  add("user", text);
  history.push({role: "user", content: text});
  const div = add("assistant", "");
  const resp = await fetch("/v1/chat/completions", {
    method: "POST",
    headers: {"Content-Type": "application/json"},
    body: JSON.stringify({messages: history, stream: true}),
  });
  const reader = resp.body.getReader();
  const dec = new TextDecoder();
  let buf = "", answer = "";
  for (;;) {
    const {done, value} = await reader.read();
    if (done) break;
    buf += dec.decode(value, {stream: true});
    for (const line of buf.split("\\n")) {
      if (!line.startsWith("data: ")) continue;
      const payload = line.slice(6).trim();
      if (payload === "[DONE]") continue;
      try {
        const delta = JSON.parse(payload).choices?.[0]?.delta?.content;
        if (delta) { answer += delta; div.textContent = "bot: " + answer; }
      } catch {}
    }
    buf = buf.slice(buf.lastIndexOf("\\n") + 1);
  }
  history.push({role: "assistant", content: answer});
});
</script>
</body>
</html>
"""

SIDE_BY_SIDE_HTML = """<!doctype html>
<html>
<head>
<meta charset="utf-8">
<title>NeuralChat TPU — side by side</title>
<style>
  :root { color-scheme: light dark; }
  body { font-family: system-ui, sans-serif; max-width: 1100px;
         margin: 2rem auto; padding: 0 1rem; }
  h1 { font-size: 1.2rem; }
  .cols { display: grid; grid-template-columns: 1fr 1fr; gap: 1rem; }
  .pane { border: 1px solid #8884; border-radius: 8px; padding: 1rem; }
  .pane h2 { font-size: .95rem; margin: 0 0 .5rem; }
  .knobs { display: flex; gap: .5rem; margin-bottom: .5rem; }
  .knobs label { font-size: .8rem; opacity: .8; }
  .knobs input { width: 4.5rem; }
  .out { min-height: 200px; white-space: pre-wrap; font-size: .95rem; }
  form { display: flex; gap: .5rem; margin-top: 1rem; }
  #q { flex: 1; padding: .6rem; border-radius: 6px; border: 1px solid #8886; }
  button { padding: .6rem 1.2rem; border-radius: 6px; border: 0;
           background: #3b6; color: white; cursor: pointer; }
</style>
</head>
<body>
<h1>NeuralChat &middot; side-by-side comparison</h1>
<div class="cols">
  <div class="pane"><h2>A</h2>
    <div class="knobs">
      <label>temp <input id="ta" value="0.2"></label>
      <label>top_p <input id="pa" value="1.0"></label>
      <label>max <input id="ma" value="128"></label>
    </div>
    <div class="out" id="oa"></div></div>
  <div class="pane"><h2>B</h2>
    <div class="knobs">
      <label>temp <input id="tb" value="1.0"></label>
      <label>top_p <input id="pb" value="0.9"></label>
      <label>max <input id="mb" value="128"></label>
    </div>
    <div class="out" id="ob"></div></div>
</div>
<form id="f">
  <input id="q" placeholder="One prompt, two configurations..." autofocus>
  <button>Compare</button>
</form>
<script>
async function streamInto(el, body) {
  el.textContent = "";
  const resp = await fetch("/v1/chat/completions", {
    method: "POST",
    headers: {"Content-Type": "application/json"},
    body: JSON.stringify(body),
  });
  const reader = resp.body.getReader();
  const dec = new TextDecoder();
  let buf = "";
  for (;;) {
    const {done, value} = await reader.read();
    if (done) break;
    buf += dec.decode(value, {stream: true});
    for (const line of buf.split("\\n")) {
      if (!line.startsWith("data: ")) continue;
      const payload = line.slice(6).trim();
      if (payload === "[DONE]") continue;
      try {
        const delta = JSON.parse(payload).choices?.[0]?.delta?.content;
        if (delta) el.textContent += delta;
      } catch {}
    }
    buf = buf.slice(buf.lastIndexOf("\\n") + 1);
  }
}
document.getElementById("f").addEventListener("submit", (e) => {
  e.preventDefault();
  const text = document.getElementById("q").value.trim();
  if (!text) return;
  const msg = [{role: "user", content: text}];
  const v = (id) => parseFloat(document.getElementById(id).value);
  // both streams run CONCURRENTLY — the continuous-batching pool decodes
  // them in the same slot group
  streamInto(document.getElementById("oa"),
    {messages: msg, stream: true, temperature: v("ta"), top_p: v("pa"),
     max_tokens: v("ma")});
  streamInto(document.getElementById("ob"),
    {messages: msg, stream: true, temperature: v("tb"), top_p: v("pb"),
     max_tokens: v("mb")});
});
</script>
</body>
</html>
"""

from intel_extension_for_transformers_tpu.neural_chat.ui.chat_app import (  # noqa: E402
    CHAT_APP_HTML,
)
from intel_extension_for_transformers_tpu.neural_chat.ui.askdoc_app import (  # noqa: E402
    ASKDOC_APP_HTML,
)

__all__ = ["CHAT_HTML", "SIDE_BY_SIDE_HTML", "CHAT_APP_HTML",
           "ASKDOC_APP_HTML"]
