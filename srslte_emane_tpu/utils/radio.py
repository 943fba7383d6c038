"""Radio object: sample-rate / gain / frequency management over an IQ device.

Reference behavior: `lib/src/radio/radio.cc` — the C++ wrapper around the RF
plugin vtable (rf_dev.h): srate/gain/freq setters, software AGC, fractional
frequency (CFO) shifting, continuous-tx zero padding between bursts, and a
pluggable device (UHD/bladeRF/Soapy/ZMQ/dummy).  Here the "devices" are the
framework's IQ endpoints: cf32 files (utils/iq_io), TCP IQ streams (the
rf_zmq_imp role), or a loopback buffer (rf_dummy_imp); the DSP (resampler,
AGC, freq shift) runs as device compute from ops/.
"""

from __future__ import annotations

import numpy as np

from ..ops import fading, resample


class LoopbackDevice:
    """rf_dummy_imp.c role: zero-filled RX, discarded TX (or loop TX->RX)."""

    def __init__(self, loop: bool = True):
        self.loop = loop
        self._buf = []

    def send(self, samples: np.ndarray):
        if self.loop:
            self._buf.append(np.asarray(samples))

    def recv(self, n: int) -> np.ndarray:
        out = np.zeros((n, 2), np.float32)
        pos = 0
        while self._buf and pos < n:
            chunk = self._buf[0]
            take = min(len(chunk), n - pos)
            out[pos : pos + take] = chunk[:take]
            if take == len(chunk):
                self._buf.pop(0)
            else:
                self._buf[0] = chunk[take:]
            pos += take
        return out


class Radio:
    """radio.cc equivalent: device-independent TX/RX with srate/gain/freq."""

    def __init__(self, device=None, srate_hz: float = 11.52e6):
        self.device = device if device is not None else LoopbackDevice()
        self.srate_hz = srate_hz
        self.tx_gain_db = 0.0
        self.rx_gain_db = 0.0
        self.tx_freq_offset_hz = 0.0
        self.rx_freq_offset_hz = 0.0
        self.agc = resample.Agc()
        self._tx_end = 0  # sample count of the last burst end (continuous tx)

    # ---- config surface (radio.h setters) ----
    def set_tx_srate(self, hz: float):
        self.srate_hz = hz

    def set_tx_gain(self, db: float):
        self.tx_gain_db = db

    def set_rx_gain(self, db: float):
        self.rx_gain_db = db

    def set_tx_freq_offset(self, hz: float):
        self.tx_freq_offset_hz = hz

    def set_rx_freq_offset(self, hz: float):
        self.rx_freq_offset_hz = hz

    # ---- data path ----
    def tx(self, samples, t_start_samples: int = None):
        """Transmit one burst; zero-pads any gap since the previous burst
        (radio.cc continuous-transmission padding)."""
        x = np.asarray(samples, np.float32)
        if self.tx_freq_offset_hz:
            import jax.numpy as jnp

            x = np.asarray(fading.apply_cfo(
                jnp.asarray(x)[None], self.tx_freq_offset_hz, self.srate_hz))[0]
        x = x * (10.0 ** (self.tx_gain_db / 20.0))
        if t_start_samples is not None and t_start_samples > self._tx_end:
            self.device.send(np.zeros((t_start_samples - self._tx_end, 2),
                                      np.float32))
            self._tx_end = t_start_samples
        self.device.send(x)
        self._tx_end += len(x)

    def rx(self, n_samples: int, agc: bool = False):
        y = self.device.recv(n_samples).astype(np.float32)
        y = y * (10.0 ** (self.rx_gain_db / 20.0))
        if self.rx_freq_offset_hz:
            import jax.numpy as jnp

            y = np.asarray(fading.apply_cfo(
                jnp.asarray(y)[None], -self.rx_freq_offset_hz, self.srate_hz))[0]
        if agc:
            import jax.numpy as jnp

            y = np.asarray(self.agc.process(jnp.asarray(y)[None]))[0]
        return y

    def resample_to(self, samples, out_rate_hz: float):
        """Arbitrary-ratio resample (resample_arb.c role) for rate changes."""
        import jax.numpy as jnp

        ratio = out_rate_hz / self.srate_hz
        return np.asarray(resample.resample_arb(jnp.asarray(samples)[None],
                                                ratio))[0]
