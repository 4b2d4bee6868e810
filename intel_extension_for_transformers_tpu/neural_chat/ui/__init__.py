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
