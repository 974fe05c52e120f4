package graft.server

/** Single-page plan builder served at `GET /` — the reference ships an HTML
  * UI over its plan repository (`core/ui/`, ~2,400 LoC of routes + assets);
  * the capability it adds over the REST surface is: edit a plan, save it,
  * list/load saved plans, preview sample rows without writing sinks, run,
  * and read run history. This page is exactly that, as one static document
  * of vanilla HTML/JS driving the existing endpoints (PUT/GET/DELETE
  * `/plans/{name}`, POST `/plans/{name}/run`, POST `/preview`, GET
  * `/runs`) — no framework, no build step, nothing to configure.
  *
  * FORM MODE (the capability the reference's per-field builder pages add,
  * `core/ui/` connection/plan forms): author a task without hand-typing
  * YAML — add/remove field rows (name + kind + one options cell whose
  * placeholder documents the kind's syntax), pick count + sink, and
  * "Build YAML" composes the plan into the editor, where the normal
  * Save/Preview/Run flow takes over. Strings are emitted as JSON scalars
  * (JSON ⊂ YAML), so regex/faker patterns survive quoting untouched.
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
      |    <details id="form">
      |    <summary style="cursor:pointer">Form builder (author a task without typing YAML)</summary>
      |    <p>
      |      task <input id="ftask" type="text" value="users" size="10">
      |      count <input id="fcount" type="number" value="10" min="1" style="width:6rem">
      |      sink <select id="fsink"><option value="">none (preview only)</option>
      |        <option>json</option><option>csv</option><option>parquet</option><option>orc</option></select>
      |      path <input id="fpath" type="text" placeholder="/tmp/data/out" size="16">
      |    </p>
      |    <table id="ftable"><thead><tr><th>field</th><th>kind</th><th>options</th><th></th></tr></thead>
      |      <tbody id="frows"></tbody></table>
      |    <p><button id="faddrow">+ field</button>
      |       <button id="fbuild">Build YAML &rarr;</button></p>
      |    </details>
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
      |// --- form builder: rows -> native-dialect YAML into the editor ---
      |// one options cell per kind; its placeholder documents the syntax and
      |// parse() maps it onto the FieldDef keys the engine dispatches on
      |const KINDS = {
      |  alphanum:   { ph: "minLen,maxLen (e.g. 5,12)",
      |                parse: v => kv(v, ["minLen", "maxLen"], parseInt) },
      |  int:        { ph: "lo,hi (e.g. 0,100)", parse: v => kv(v, ["lo", "hi"], Number) },
      |  double:     { ph: "lo,hi (e.g. 0,1)", parse: v => kv(v, ["lo", "hi"], Number) },
      |  boolean:    { ph: "", parse: () => ({}) },
      |  oneOf:      { ph: "comma values (e.g. open,closed)",
      |                parse: v => ({ values: v.split(",").map(s => s.trim()).filter(Boolean) }) },
      |  regex:      { ph: "pattern (e.g. USR[0-9]{6})", parse: v => ({ pattern: v }) },
      |  faker:      { ph: "template (e.g. #{Name.fullName})", parse: v => ({ template: v }) },
      |  sequential: { ph: "prefix,pad (e.g. ACC,8)",
      |                parse: v => { const p = v.split(","); return { prefix: p[0] || "",
      |                  ...(p[1] ? { pad: parseInt(p[1]) } : {}) }; } },
      |  date:       { ph: "start,days (e.g. 2024-01-01,365)",
      |                parse: v => { const p = v.split(","); return { ...(p[0] ? { start: p[0] } : {}),
      |                  ...(p[1] ? { days: parseInt(p[1]) } : {}) }; } },
      |  timestamp:  { ph: "start,days (e.g. 2024-01-01 00:00:00,30)",
      |                parse: v => { const p = v.split(","); return { ...(p[0] ? { start: p[0] } : {}),
      |                  ...(p[1] ? { days: parseInt(p[1]) } : {}) }; } },
      |  sql:        { ph: "expression (e.g. UPPER(name))", parse: v => ({ sql: v }) },
      |};
      |function kv(v, names, f) {
      |  const p = v.split(",").map(s => s.trim());
      |  const o = {};
      |  names.forEach((n, i) => { if (p[i] !== undefined && p[i] !== "") o[n] = f(p[i]); });
      |  return o;
      |}
      |// pure YAML composer (no DOM): fields = [{name, kind, opts}]. Kept
      |// DOM-free so it is testable under plain node (UiSpec runs it).
      |function buildYaml(plan, task, count, sinkFmt, sinkPath, fields) {
      |  // strings emitted with JSON.stringify: JSON scalars are valid YAML,
      |  // so regex/faker patterns need no hand-escaping
      |  const q = v => typeof v === "string" ? JSON.stringify(v) : v;
      |  const lines = [`name: ${q(plan)}`, "tasks:",
      |    `  - name: ${q(task)}`, `    count: ${parseInt(count) || 10}`];
      |  if (sinkFmt && sinkPath) {
      |    lines.push("    sink:", `      format: ${sinkFmt}`, `      path: ${q(sinkPath)}`);
      |  }
      |  lines.push("    fields:");
      |  for (const f of fields) {
      |    if (!f.name) continue;
      |    const extra = KINDS[f.kind].parse((f.opts || "").trim());
      |    const type = f.kind === "faker" ? "template" : f.kind;
      |    const kvs = Object.entries({ name: f.name, type, ...extra })
      |      .map(([k, v]) => `${k}: ${Array.isArray(v) ? "[" + v.map(q).join(", ") + "]" : q(v)}`);
      |    lines.push(`      - {${kvs.join(", ")}}`);
      |  }
      |  return lines.join("\n") + "\n";
      |}
      |// --- DOM wiring (everything below touches the page) ---
      |function addRow(name, kind, opts) {
      |  const tr = document.createElement("tr");
      |  tr.innerHTML =
      |    `<td><input class="fname" size="12" value="${name || ""}"></td>` +
      |    `<td><select class="fkind">` +
      |    Object.keys(KINDS).map(k => `<option${k === kind ? " selected" : ""}>${k}</option>`).join("") +
      |    `</select></td>` +
      |    `<td><input class="fopts" size="30" value="${opts || ""}"></td>` +
      |    `<td><button class="frm">&times;</button></td>`;
      |  const sync = () => tr.querySelector(".fopts").placeholder =
      |    KINDS[tr.querySelector(".fkind").value].ph;
      |  tr.querySelector(".fkind").onchange = sync; sync();
      |  tr.querySelector(".frm").onclick = () => tr.remove();
      |  $("frows").appendChild(tr);
      |}
      |$("faddrow").onclick = () => addRow("", "alphanum", "");
      |addRow("id", "regex", "USR[0-9]{6}");
      |addRow("name", "faker", "#{Name.fullName}");
      |$("fbuild").onclick = () => {
      |  const fields = [...$("frows").children].map(tr => ({
      |    name: tr.querySelector(".fname").value.trim(),
      |    kind: tr.querySelector(".fkind").value,
      |    opts: tr.querySelector(".fopts").value }));
      |  $("plan").value = buildYaml($("name").value, $("ftask").value,
      |    $("fcount").value, $("fsink").value, $("fpath").value, fields);
      |  out("built YAML from form — Preview / Save / Run it");
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
