/* Browser streaming client for the TPU STT server.
 *
 * Protocol (matches stt_tpu/server/transport/ws_server.py and the
 * reference bridge): open /ws/stream, send a JSON "start" payload, then
 * binary Int16 PCM frames; {"type":"end"} finishes. Inbound frames are
 * JSON: session | result | error | done. Results carry committed_text /
 * unstable_text, rendered with prefix diffing so the stable prefix never
 * flickers.
 */
"use strict";

const $ = (id) => document.getElementById(id);

const state = {
  ws: null,
  audioCtx: null,
  sourceNode: null,
  procNode: null,
  mediaStream: null,
  running: false,
  sessionId: null,
  targetRate: 16000,
  startedAt: 0,
};

// ---------------------------------------------------------------------------
// UI helpers
// ---------------------------------------------------------------------------

function log(line, cls = "") {
  const el = document.createElement("div");
  el.textContent = line;
  if (cls) el.className = cls;
  const box = $("log");
  box.prepend(el);
  while (box.children.length > 80) box.removeChild(box.lastChild);
}

function setStatus(text) {
  $("status").textContent = text;
}

function setRunning(running) {
  state.running = running;
  $("mic-btn").disabled = running;
  $("stop-btn").disabled = !running;
  setStatus(running ? "streaming" : "idle");
}

function defaultServerUrl() {
  const proto = location.protocol === "https:" ? "wss" : "ws";
  const host = location.hostname || "localhost";
  return `${proto}://${host}:8001/ws/stream`;
}

$("server-url").value = localStorage.getItem("stt.server") || defaultServerUrl();

$("theme-toggle").onclick = () => {
  const body = document.body;
  body.dataset.theme = body.dataset.theme === "dark" ? "light" : "dark";
  localStorage.setItem("stt.theme", body.dataset.theme);
};
document.body.dataset.theme = localStorage.getItem("stt.theme") || "dark";

// ---------------------------------------------------------------------------
// Transcript rendering with committed/unstable split
// ---------------------------------------------------------------------------

const transcript = { committed: "", unstable: "" };

function renderResult(msg) {
  const committed = (msg.committed_text || "").trim();
  const unstable = (msg.unstable_text || "").trim();
  if (committed || unstable) {
    if (committed) transcript.committed = committed;
    transcript.unstable = msg.is_final ? "" : unstable;
    if (msg.is_final && unstable) {
      transcript.committed = `${transcript.committed} ${unstable}`.trim();
    }
  } else {
    // server without commit tracking: local prefix merge
    const text = (msg.text || "").trim();
    if (msg.is_final) {
      transcript.committed = mergeTranscript(transcript.committed, text);
      transcript.unstable = "";
    } else {
      transcript.unstable = text;
    }
  }
  $("committed").textContent = transcript.committed + (transcript.committed ? " " : "");
  $("unstable").textContent = transcript.unstable;
  if (msg.is_final) {
    log(`[final ${msg.start_sec?.toFixed(1)}–${msg.end_sec?.toFixed(1)}s] ${msg.text}`, "final");
  }
}

function mergeTranscript(prefix, next) {
  prefix = prefix.trim();
  next = next.trim();
  if (!prefix) return next;
  if (!next) return prefix;
  if (next.startsWith(prefix)) return next;
  return `${prefix} ${next}`;
}

// ---------------------------------------------------------------------------
// WebSocket session
// ---------------------------------------------------------------------------

function buildStartPayload() {
  const attributes = {};
  if ($("partial").checked) attributes.partial = "true";
  const apiKey = $("api-key").value.trim();
  if (apiKey) attributes.api_key = apiKey;
  state.sessionId = `web-${Date.now().toString(36)}-${Math.random().toString(36).slice(2, 8)}`;
  return {
    type: "start",
    session_id: state.sessionId,
    sample_rate: state.targetRate,
    language_code: $("language").value,
    decode_profile: $("profile").value,
    task: $("task").value,
    vad_silence: parseFloat($("vad-silence").value) || 0,
    attributes,
  };
}

function openSession(onReady) {
  const url = $("server-url").value.trim();
  localStorage.setItem("stt.server", url);
  const ws = new WebSocket(url);
  ws.binaryType = "arraybuffer";
  ws.onopen = () => ws.send(JSON.stringify(buildStartPayload()));
  ws.onmessage = (ev) => {
    let msg;
    try { msg = JSON.parse(ev.data); } catch { return; }
    switch (msg.type) {
      case "session":
        $("session-label").textContent = msg.session_id;
        log(`session ${msg.session_id} profile=${msg.decode_profile} lang=${msg.language_code || "auto"}`);
        onReady(ws);
        break;
      case "result":
        renderResult(msg);
        break;
      case "error":
        log(`error: ${msg.message || msg.code}`, "error");
        stopAll();
        break;
      case "done": {
        const t = msg.trailing || {};
        const inf = t["stt-decode-inference-sec"];
        log(`done (decodes=${t["stt-decode-count"] || 0}, inference=${inf || 0}s)`);
        stopAll();
        break;
      }
    }
  };
  ws.onerror = () => { log("websocket error", "error"); };
  ws.onclose = () => { if (state.running) stopAll(); };
  state.ws = ws;
}

function sendEnd() {
  if (state.ws && state.ws.readyState === WebSocket.OPEN) {
    state.ws.send(JSON.stringify({ type: "end" }));
  }
}

// ---------------------------------------------------------------------------
// Audio capture: mic -> downsample -> Int16 frames
// ---------------------------------------------------------------------------

function downsampleTo16k(input, inRate) {
  if (inRate === state.targetRate) return Int16Array.from(
    input, (v) => Math.max(-32768, Math.min(32767, v * 32767)));
  const ratio = inRate / state.targetRate;
  const outLen = Math.floor(input.length / ratio);
  const out = new Int16Array(outLen);
  for (let i = 0; i < outLen; i++) {
    const start = Math.floor(i * ratio);
    const end = Math.min(input.length, Math.floor((i + 1) * ratio));
    let sum = 0;
    for (let j = start; j < end; j++) sum += input[j];
    const v = sum / Math.max(1, end - start);
    out[i] = Math.max(-32768, Math.min(32767, v * 32767));
  }
  return out;
}

async function startMic() {
  transcript.committed = "";
  transcript.unstable = "";
  $("committed").textContent = "";
  $("unstable").textContent = "";
  try {
    state.mediaStream = await navigator.mediaDevices.getUserMedia({
      audio: { channelCount: 1, echoCancellation: true, noiseSuppression: true },
    });
  } catch (err) {
    log(`microphone denied: ${err.message}`, "error");
    return;
  }
  openSession((ws) => {
    state.audioCtx = new (window.AudioContext || window.webkitAudioContext)();
    const inRate = state.audioCtx.sampleRate;
    state.sourceNode = state.audioCtx.createMediaStreamSource(state.mediaStream);
    // ScriptProcessor keeps compatibility with older mobile browsers
    state.procNode = state.audioCtx.createScriptProcessor(4096, 1, 1);
    state.procNode.onaudioprocess = (ev) => {
      if (!state.running || ws.readyState !== WebSocket.OPEN) return;
      const samples = ev.inputBuffer.getChannelData(0);
      let peak = 0;
      for (let i = 0; i < samples.length; i += 16) {
        peak = Math.max(peak, Math.abs(samples[i]));
      }
      $("level").value = peak;
      const pcm = downsampleTo16k(samples, inRate);
      if (pcm.length) ws.send(pcm.buffer);
    };
    state.sourceNode.connect(state.procNode);
    state.procNode.connect(state.audioCtx.destination);
    setRunning(true);
    state.startedAt = performance.now();
  });
}

// ---------------------------------------------------------------------------
// WAV file upload (16-bit PCM)
// ---------------------------------------------------------------------------

function parseWav(buffer) {
  const view = new DataView(buffer);
  if (view.getUint32(0, false) !== 0x52494646) throw new Error("not a RIFF file");
  let offset = 12;
  let fmt = null, dataOffset = null, dataLen = 0;
  while (offset + 8 <= view.byteLength) {
    const id = view.getUint32(offset, false);
    const size = view.getUint32(offset + 4, true);
    if (id === 0x666d7420) { // "fmt "
      fmt = {
        channels: view.getUint16(offset + 10, true),
        rate: view.getUint32(offset + 12, true),
        bits: view.getUint16(offset + 22, true),
      };
    } else if (id === 0x64617461) { // "data"
      dataOffset = offset + 8;
      dataLen = size;
    }
    offset += 8 + size + (size % 2);
  }
  if (!fmt || dataOffset === null) throw new Error("missing fmt/data chunk");
  if (fmt.bits !== 16) throw new Error("only 16-bit PCM WAV supported");
  let samples = new Int16Array(buffer, dataOffset, dataLen / 2);
  if (fmt.channels > 1) {
    const mono = new Int16Array(Math.floor(samples.length / fmt.channels));
    for (let i = 0; i < mono.length; i++) samples[i] = samples[i * fmt.channels];
    samples = samples.subarray(0, mono.length);
  }
  return { samples, rate: fmt.rate };
}

async function streamFile(file) {
  const buffer = await file.arrayBuffer();
  let wav;
  try { wav = parseWav(buffer); } catch (err) {
    log(`wav parse failed: ${err.message}`, "error");
    return;
  }
  transcript.committed = "";
  transcript.unstable = "";
  openSession(async (ws) => {
    setRunning(true);
    const chunkMs = 100;
    const chunkSamples = Math.floor(wav.rate * chunkMs / 1000);
    // resample by sending at the file's native rate: the server resamples
    const startPayloadRate = wav.rate;
    log(`streaming ${file.name} (${(wav.samples.length / wav.rate).toFixed(1)}s @ ${wav.rate}Hz)`);
    for (let i = 0; i < wav.samples.length && state.running; i += chunkSamples) {
      const chunk = wav.samples.subarray(i, Math.min(i + chunkSamples, wav.samples.length));
      ws.send(chunk.buffer.slice(chunk.byteOffset, chunk.byteOffset + chunk.byteLength));
      await new Promise((r) => setTimeout(r, chunkMs));
    }
    sendEnd();
  });
  // the start payload must carry the file's sample rate
  state.targetRate = wav.rate;
}

// ---------------------------------------------------------------------------
// Lifecycle
// ---------------------------------------------------------------------------

function stopAll() {
  if (state.procNode) { state.procNode.disconnect(); state.procNode = null; }
  if (state.sourceNode) { state.sourceNode.disconnect(); state.sourceNode = null; }
  if (state.audioCtx) { state.audioCtx.close(); state.audioCtx = null; }
  if (state.mediaStream) {
    state.mediaStream.getTracks().forEach((t) => t.stop());
    state.mediaStream = null;
  }
  state.targetRate = 16000;
  setRunning(false);
}

$("mic-btn").onclick = startMic;
$("stop-btn").onclick = () => { sendEnd(); stopAll(); };
$("file-input").onchange = (ev) => {
  const file = ev.target.files[0];
  if (file) streamFile(file);
  ev.target.value = "";
};

if ("serviceWorker" in navigator && location.protocol === "https:") {
  navigator.serviceWorker.register("sw.js").catch(() => {});
}
