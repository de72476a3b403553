// WebHID dictation-device support — from-scratch rebuild of the
// reference's Philips DictationSupport integration (reference
// nginx/static/dict/dict.js:239-435 + vendored sdk.js): SpeechMike
// HID/Premium, Nuance PowerMic 3/4 and Philips foot controls drive
// recording hands-free (RECORD press → start, release → stop) with LED
// feedback on devices that have one.
//
// Protocol facts (public WebHID report layouts):
// - SpeechMike HID (vendor 0x0911, usagePage 0xFFA0): input reports
//   lead with a command byte; 0x80 = button event, buttons as a 16-bit
//   little-endian mask at offset 7. Output command 0x02 sets LEDs
//   (record LED green/red bit pairs in byte 5 of the 8-byte payload).
// - PowerMic 3 (vendor 0x0554, product 0x1001): 16-bit button mask at
//   offset 1; 1-byte output report sets the LED (0 off / 1 red / 2 green).
// - Foot controls (0x0911:0x1844 / 0x091A): 8-bit pedal mask at offset 0.

const HID_FILTERS = [
  { vendorId: 0x0911, usagePage: 0xffa0, usage: 1 }, // SpeechMike HID
  { vendorId: 0x0554, productId: 0x0064, usagePage: 0xffa0, usage: 1 }, // PowerMic 4
  { vendorId: 0x0554, productId: 0x1001, usagePage: 1 }, // PowerMic 3
  { vendorId: 0x0911, productId: 0x1844, usagePage: 1, usage: 4 }, // foot control
  { vendorId: 0x0911, productId: 0x091a, usagePage: 1, usage: 4 },
];

// SpeechMike button mask (report offset 7, LE)
const SM_RECORD = 0x0100;
// PowerMic 3 mask (offset 1, LE)
const PM3_RECORD = 0x0004;
// foot-pedal middle pedal doubles as record
const FOOT_RECORD = 0x02;

class DictationDevice {
  constructor(hidDevice, onRecord) {
    this.dev = hidDevice;
    this.onRecord = onRecord; // (recording: bool) => void
    this.recording = false;
    this.kind = this._classify();
  }

  _classify() {
    if (this.dev.vendorId === 0x0554) return "powermic";
    const pages = (this.dev.collections || []).map((c) => c.usagePage);
    if (pages.includes(0xffa0)) return "speechmike";
    return "footcontrol";
  }

  async open() {
    if (!this.dev.opened) await this.dev.open();
    this.dev.addEventListener("inputreport", (e) => this._onReport(e.data));
  }

  _mask(data) {
    switch (this.kind) {
      case "speechmike":
        // only button-press events carry the mask
        if (data.getUint8(0) !== 0x80) return null;
        return data.getUint16(7, true) & SM_RECORD ? 1 : 0;
      case "powermic":
        return data.getUint16(1, true) & PM3_RECORD ? 1 : 0;
      default:
        return data.getUint8(0) & FOOT_RECORD ? 1 : 0;
    }
  }

  async _onReport(data) {
    const pressed = this._mask(data);
    if (pressed === null) return;
    if (pressed && !this.recording) {
      this.recording = true;
      await this.setRecordLed(true);
      this.onRecord(true);
    } else if (!pressed && this.recording) {
      this.recording = false;
      await this.setRecordLed(false);
      this.onRecord(false);
    }
  }

  async setRecordLed(on) {
    try {
      if (this.kind === "speechmike") {
        const payload = new Uint8Array(9);
        payload[0] = 0x02; // SET_LED
        payload[6] = on ? 0x04 : 0x00; // record LED red, solid
        await this.dev.sendReport(0, payload);
      } else if (this.kind === "powermic") {
        await this.dev.sendReport(0, new Uint8Array([on ? 1 : 0]));
      }
    } catch (e) {
      /* LED support is best-effort — some devices reject output reports */
    }
  }
}

class DictationDeviceManager {
  constructor(onRecord, onLog) {
    this.onRecord = onRecord;
    this.log = onLog || (() => {});
    this.devices = [];
  }

  available() {
    return typeof navigator !== "undefined" && !!navigator.hid;
  }

  async init() {
    if (!this.available()) {
      this.log("WebHID not available — click buttons to record");
      return;
    }
    navigator.hid.addEventListener("connect", (e) => this._add(e.device));
    navigator.hid.addEventListener("disconnect", (e) => this._remove(e.device));
    for (const d of await navigator.hid.getDevices()) await this._add(d);
    if (!this.devices.length) {
      this.log("No dictation device paired yet — use 'Pair device'");
    }
  }

  async requestDevice() {
    const granted = await navigator.hid.requestDevice({ filters: HID_FILTERS });
    for (const d of granted) await this._add(d);
  }

  async _add(hidDevice) {
    if (this.devices.some((d) => d.dev === hidDevice)) return;
    const device = new DictationDevice(hidDevice, this.onRecord);
    try {
      await device.open();
    } catch (e) {
      this.log(`device open failed: ${e.message}`);
      return;
    }
    this.devices.push(device);
    this.log(
      `dictation device ready: ${hidDevice.productName || device.kind} ` +
      `(${hidDevice.vendorId.toString(16)}:${hidDevice.productId.toString(16)})`
    );
  }

  _remove(hidDevice) {
    this.devices = this.devices.filter((d) => d.dev !== hidDevice);
    this.log("dictation device disconnected");
  }
}

window.DictationDeviceManager = DictationDeviceManager;
