/* Web-search tool loop (reference demo wires this through main.js + the
 * /api/search proxy): the session declares a `web_search` function tool;
 * when the assistant calls it we hit the same-origin search proxy (the
 * API key lives server-side), post the result back as a
 * function_call_output item, and ask for the follow-up response. */

export const WEB_SEARCH_TOOL = {
  type: "function",
  name: "web_search",
  description:
    "Search the web for current information. Use for questions about " +
    "recent events, live facts, or anything outside your knowledge.",
  parameters: {
    type: "object",
    properties: { query: { type: "string", description: "search query" } },
    required: ["query"],
  },
};

/* Fetch /api/config once to learn whether the host server holds a search
 * key; callers gate the tool on this. */
export async function searchAvailable() {
  try {
    const resp = await fetch("/api/config");
    return (await resp.json()).search === true;
  } catch (e) {
    return false; // not served by demo/server.py (e.g. raw static hosting)
  }
}

/* Handle one response.function_call_arguments.done event.  Returns true
 * when the call was ours (so the router can skip other handling). */
export async function handleToolCall(evt, client, chat) {
  if (evt.name !== "web_search") return false;
  let query = "";
  try {
    query = JSON.parse(evt.arguments || "{}").query ?? "";
  } catch (e) { /* malformed arguments: search the raw string */
    query = String(evt.arguments || "");
  }
  chat.status(`searching: ${query}…`);
  let output;
  try {
    const resp = await fetch("/api/search", {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify({ q: query }),
    });
    if (!resp.ok) throw new Error(`search ${resp.status}`);
    output = JSON.stringify(await resp.json());
  } catch (e) {
    output = JSON.stringify({ error: `search failed: ${e.message ?? e}` });
  }
  client.sendEvent({
    type: "conversation.item.create",
    item: { type: "function_call_output", call_id: evt.call_id, output },
  });
  client.sendEvent({ type: "response.create", response: {} });
  return true;
}
