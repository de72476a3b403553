// Dictation client (reference nginx/static/dict/dict.js:18-184 rebuilt):
// WebAudio capture → 16 kHz mono WAV → POST /api/asr multipart.

let ctx, stream, source, processor, chunks = [];

function floatTo16(buf) {
  const out = new Int16Array(buf.length);
  for (let i = 0; i < buf.length; i++) {
    const s = Math.max(-1, Math.min(1, buf[i]));
    out[i] = s < 0 ? s * 0x8000 : s * 0x7FFF;
  }
  return out;
}

function encodeWav(samples, sampleRate) {
  const buffer = new ArrayBuffer(44 + samples.length * 2);
  const v = new DataView(buffer);
  const writeStr = (off, s) => { for (let i = 0; i < s.length; i++) v.setUint8(off + i, s.charCodeAt(i)); };
  writeStr(0, "RIFF"); v.setUint32(4, 36 + samples.length * 2, true);
  writeStr(8, "WAVE"); writeStr(12, "fmt ");
  v.setUint32(16, 16, true); v.setUint16(20, 1, true); v.setUint16(22, 1, true);
  v.setUint32(24, sampleRate, true); v.setUint32(28, sampleRate * 2, true);
  v.setUint16(32, 2, true); v.setUint16(34, 16, true);
  writeStr(36, "data"); v.setUint32(40, samples.length * 2, true);
  new Int16Array(buffer, 44).set(samples);
  return new Blob([buffer], { type: "audio/wav" });
}

async function start() {
  stream = await navigator.mediaDevices.getUserMedia({ audio: { channelCount: 1 } });
  ctx = new AudioContext({ sampleRate: 16000 });
  source = ctx.createMediaStreamSource(stream);
  processor = ctx.createScriptProcessor(4096, 1, 1);
  chunks = [];
  processor.onaudioprocess = (e) => chunks.push(new Float32Array(e.inputBuffer.getChannelData(0)));
  source.connect(processor);
  processor.connect(ctx.destination);
  document.getElementById("start").disabled = true;
  document.getElementById("stop").disabled = false;
}

async function stop() {
  processor.disconnect(); source.disconnect();
  stream.getTracks().forEach((t) => t.stop());
  await ctx.close();
  document.getElementById("start").disabled = false;
  document.getElementById("stop").disabled = true;

  const total = chunks.reduce((n, c) => n + c.length, 0);
  const flat = new Float32Array(total);
  let off = 0;
  for (const c of chunks) { flat.set(c, off); off += c.length; }
  const wav = encodeWav(floatTo16(flat), 16000);

  const model = document.getElementById("model").value;
  const beam = document.getElementById("beam").value;
  const form = new FormData();
  form.append("audio_file", wav, "dictation.wav");
  const t0 = performance.now();
  const resp = await fetch(`/api/asr?model=${model}&beam_size=${beam}`, {
    method: "POST", body: form,
  });
  const data = await resp.json();
  document.getElementById("transcript").textContent += (data.text || data.error) + "\n";
  document.getElementById("meta").textContent =
    `infer ${data.infer_time?.toFixed(1)} ms · ${data.infer_speedup}x realtime · ` +
    `round-trip ${(performance.now() - t0).toFixed(0)} ms · lang ${data.language}`;
}

document.getElementById("start").onclick = start;
document.getElementById("stop").onclick = stop;

// Hands-free recording from a WebHID dictation device (SpeechMike /
// PowerMic / foot control — hid.js; reference dict.js:239-435): the
// RECORD button starts capture on press and transcribes on release.
const hidLog = (m) => {
  document.getElementById("meta").textContent = m;
};
const hid = new DictationDeviceManager(
  (recording) => (recording ? start() : stop()),
  hidLog
);
if (hid.available()) {
  hid.init();
  document.getElementById("pair").onclick = () => hid.requestDevice();
} else {
  document.getElementById("pair").disabled = true;
}
