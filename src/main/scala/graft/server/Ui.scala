package graft.server

/** Single-page plan builder served at `GET /` — the reference ships an HTML
  * UI over its plan repository (`core/ui/`, ~2,400 LoC of routes + assets);
  * the capability it adds over the REST surface is: edit a plan, save it,
  * list/load saved plans, preview sample rows without writing sinks, run,
  * and read run history. This page is exactly that, as one static document
  * of vanilla HTML/JS driving the existing endpoints (PUT/GET/DELETE
  * `/plans/{name}`, POST `/plans/{name}/run`, POST `/preview`, GET
  * `/runs`) — no framework, no build step, nothing to configure.
  */
object Ui {

  val Html: String =
    """<!doctype html>
      |<html lang="en">
      |<head>
      |<meta charset="utf-8">
      |<title>graft — plan builder</title>
      |<style>
      |  body { font-family: system-ui, sans-serif; margin: 1.5rem; max-width: 70rem; }
      |  h1 { font-size: 1.2rem; }
      |  textarea { width: 100%; height: 18rem; font-family: monospace; font-size: 0.85rem; }
      |  input[type=text] { font-family: monospace; }
      |  button { margin-right: 0.4rem; }
      |  #out { white-space: pre-wrap; font-family: monospace; font-size: 0.8rem;
      |         background: #f6f6f6; padding: 0.6rem; border-radius: 4px; min-height: 3rem; }
      |  #plans li { cursor: pointer; font-family: monospace; }
      |  table { border-collapse: collapse; font-size: 0.8rem; }
      |  td, th { border: 1px solid #ccc; padding: 2px 6px; font-family: monospace; }
      |  .row { display: flex; gap: 2rem; align-items: flex-start; }
      |  .col { flex: 1; }
      |</style>
      |</head>
      |<body>
      |<h1>graft — plan builder</h1>
      |<div class="row">
      |  <div class="col">
      |    <p>
      |      <input id="name" type="text" placeholder="plan name" value="my_plan">
      |      <button id="save">Save</button>
      |      <button id="run">Run</button>
      |      <button id="preview">Preview</button>
      |      <button id="del">Delete</button>
      |    </p>
      |    <textarea id="plan" spellcheck="false">name: example
      |tasks:
      |  - name: accounts
      |    count: 100
      |    fields:
      |      - {name: account_id, type: sequential, prefix: ACC, pad: 8}
      |      - {name: balance, type: double, lo: 0, hi: 10000}
      |      - {name: status, type: oneOf, values: [open, closed]}
      |</textarea>
      |    <h2 style="font-size:1rem">Output</h2>
      |    <div id="out">ready</div>
      |  </div>
      |  <div class="col" style="max-width: 22rem">
      |    <h2 style="font-size:1rem">Saved plans</h2>
      |    <ul id="plans"></ul>
      |    <h2 style="font-size:1rem">Run history</h2>
      |    <div id="runs"></div>
      |  </div>
      |</div>
      |<script>
      |const $ = id => document.getElementById(id);
      |const out = t => { $("out").textContent = typeof t === "string" ? t : JSON.stringify(t, null, 1); };
      |async function refresh() {
      |  const names = await (await fetch("/plans")).json();
      |  $("plans").innerHTML = names.map(n => `<li data-n="${n}">${n}</li>`).join("");
      |  for (const li of $("plans").children)
      |    li.onclick = async () => {
      |      const d = await (await fetch(`/plans/${li.dataset.n}`)).json();
      |      $("name").value = d.name; $("plan").value = d.plan; out(`loaded ${d.name}`);
      |    };
      |  const runs = await (await fetch("/runs")).json();
      |  $("runs").innerHTML = runs.length === 0 ? "<i>none</i>" :
      |    "<table><tr><th>plan</th><th>status</th></tr>" +
      |    runs.slice(-8).reverse().map(r => `<tr><td>${r.plan}</td><td>${r.status}</td></tr>`).join("") +
      |    "</table>";
      |}
      |$("save").onclick = async () => {
      |  const r = await fetch(`/plans/${$("name").value}`, { method: "PUT", body: $("plan").value });
      |  out(await r.json()); refresh();
      |};
      |$("del").onclick = async () => {
      |  out(await (await fetch(`/plans/${$("name").value}`, { method: "DELETE" })).json()); refresh();
      |};
      |$("run").onclick = async () => {
      |  out("running...");
      |  await fetch(`/plans/${$("name").value}`, { method: "PUT", body: $("plan").value });
      |  out(await (await fetch(`/plans/${$("name").value}/run`, { method: "POST" })).json());
      |  refresh();
      |};
      |$("preview").onclick = async () => {
      |  out("previewing...");
      |  const r = await (await fetch("/preview", { method: "POST", body: $("plan").value })).json();
      |  if (!r.samples) return out(r);
      |  out(r.samples.map(s => s.dataset + ":\n" +
      |    s.rows.map(x => JSON.stringify(x)).join("\n")).join("\n\n"));
      |};
      |refresh();
      |</script>
      |</body>
      |</html>
      |""".stripMargin
}
