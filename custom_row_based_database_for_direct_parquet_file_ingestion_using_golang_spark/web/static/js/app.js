// Chat client for the Spark-backed engine. Original implementation of the
// reference client's behavior (web/static/js/app.js): same endpoints, same
// response envelope ({success, result, generatedSQL, error}), same
// conversation persistence flow (every user/bot exchange is appended to the
// active conversation via POST /api/conversations/{id}/message).
"use strict";

const $ = (id) => document.getElementById(id);
let activeConv = null; // {id, title}

async function api(path, opts) {
  const res = await fetch(path, opts);
  return res.json();
}

// ---- conversations ---------------------------------------------------------

async function refreshConvList() {
  const data = await api("/api/conversations");
  const ul = $("conv-list");
  ul.innerHTML = "";
  if (!data.success) return;
  for (const c of data.conversations) {
    const li = document.createElement("li");
    li.className = activeConv && activeConv.id === c.id ? "active" : "";
    const name = document.createElement("span");
    name.textContent = c.title || "Untitled";
    name.onclick = () => openConversation(c.id);
    const del = document.createElement("button");
    del.textContent = "×";
    del.title = "Delete";
    del.onclick = async (e) => {
      e.stopPropagation();
      await api(`/api/conversations/${c.id}`, { method: "DELETE" });
      if (activeConv && activeConv.id === c.id) {
        activeConv = null;
        $("messages").innerHTML = "";
        $("conv-title").textContent = "SparkDB";
      }
      refreshConvList();
    };
    li.append(name, del);
    ul.appendChild(li);
  }
}

async function newConversation() {
  const data = await api("/api/conversations", { method: "POST", body: "{}" });
  if (data.success) {
    activeConv = data.conversation;
    $("messages").innerHTML = "";
    $("conv-title").textContent = activeConv.title;
    refreshConvList();
  }
}

async function openConversation(id) {
  const data = await api(`/api/conversations/${id}`);
  if (!data.success) return;
  activeConv = data.conversation;
  $("conv-title").textContent = activeConv.title || "Untitled";
  const box = $("messages");
  box.innerHTML = "";
  for (const m of activeConv.messages || []) {
    // stored schema: user rows carry "text", bot rows "result"/"error"+"sql"
    const body =
      m.role === "user" ? m.text : m.error ? `error: ${m.error}` : m.result;
    addMsg(m.role === "user" ? "user" : "bot", body || "", m.sql);
  }
  refreshConvList();
}

// ---- chat ------------------------------------------------------------------

function addMsg(role, text, sql) {
  const div = document.createElement("div");
  div.className = `msg ${role}`;
  if (sql) {
    const tag = document.createElement("div");
    tag.className = "gen-sql";
    tag.textContent = sql;
    div.appendChild(tag);
  }
  const pre = document.createElement("pre");
  pre.textContent = text;
  div.appendChild(pre);
  $("messages").appendChild(div);
  div.scrollIntoView({ block: "end" });
}

async function send() {
  const q = $("prompt").value.trim();
  if (!q) return;
  $("prompt").value = "";
  // create the conversation BEFORE rendering the bubble — newConversation
  // clears #messages and would wipe the just-typed first message
  if (!activeConv) await newConversation();
  addMsg("user", q);
  const isNatural = $("nl-mode").checked;
  const data = await api("/api/query", {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify({
      query: q,
      isNatural,
      conversationId: activeConv ? activeConv.id : undefined,
    }),
  });
  const text = data.success ? data.result : `error: ${data.error}`;
  addMsg("bot", text, data.generatedSQL);
  if (activeConv) {
    await api(`/api/conversations/${activeConv.id}/message`, {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify({ userText: q, botData: data }),
    });
    refreshConvList(); // first message may retitle the conversation
  }
}

// ---- tables panel ----------------------------------------------------------

async function refreshTables() {
  const data = await api("/api/tables");
  const body = $("tables-body");
  if (!data.success) {
    body.textContent = data.error;
    return;
  }
  body.innerHTML = "";
  for (const t of data.tables || []) {
    const d = document.createElement("details");
    const s = document.createElement("summary");
    s.textContent = t.name;
    d.appendChild(s);
    const ul = document.createElement("ul");
    for (const c of t.columns) {
      const li = document.createElement("li");
      li.textContent = `${c.name} ${c.type}`;
      ul.appendChild(li);
    }
    d.appendChild(ul);
    body.appendChild(d);
  }
  if (!body.childElementCount) body.textContent = "no tables yet";
}

// ---- upload ----------------------------------------------------------------

async function upload(ev) {
  ev.preventDefault();
  const form = $("upload-form");
  $("upload-status").textContent = "uploading…";
  const data = await api("/api/upload", {
    method: "POST",
    body: new FormData(form),
  });
  $("upload-status").textContent = data.success
    ? "imported ✓"
    : `error: ${data.error}`;
  if (data.success) refreshTables();
}

// ---- wiring ----------------------------------------------------------------

document.addEventListener("DOMContentLoaded", () => {
  $("send").onclick = send;
  $("prompt").addEventListener("keydown", (e) => {
    if (e.key === "Enter" && (e.ctrlKey || e.metaKey)) send();
  });
  $("new-chat").onclick = newConversation;
  $("show-tables").onclick = () => {
    $("tables-panel").classList.toggle("hidden");
    refreshTables();
  };
  $("show-upload").onclick = () => $("upload-dialog").showModal();
  $("upload-cancel").onclick = () => $("upload-dialog").close();
  $("upload-form").addEventListener("submit", upload);
  refreshConvList();
});
