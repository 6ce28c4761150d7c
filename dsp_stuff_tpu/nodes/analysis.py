"""Analysis sink nodes: Wave View, Spectrogram, Pitch Detector.

In the reference these draw into the egui UI; offline they return arrays,
collected into the compiled graph's ``aux`` outputs under
``"<cfg_name>:<node_id>"`` keys.
"""

from __future__ import annotations

import jax.numpy as jnp

from dsp_stuff_tpu.registry import register_node, ParamSpec, FieldSpec
from dsp_stuff_tpu.ops.fftspec import spectrogram
from dsp_stuff_tpu.ops.pitch_mpm import detect_pitch


@register_node(
    title="Wave view", cfg_name="wave_view",
    description="Inspect the waveform of a signal",
    inputs=("in",), is_sink=True,
)
class WaveView:
    """Oscilloscope sink (wave_view.rs).  The reference's 4096-sample ring +
    frame-rate decimation is a UI artifact; offline analysis returns the
    full averaged input signal.  ``sweeps`` reproduces the decimated
    instrument exactly for any frame rate."""

    RING = 4096          # wave_view.rs:145 circular_buffer::<f32>(4096)
    SMA_WINDOW = 32      # wave_view.rs:23 SumTreeSMA<f32, f32, 32>

    @staticmethod
    def process_seq(params, state, inputs):
        return {}, state

    @staticmethod
    def analyze(params, inputs):
        return {"samples": inputs["in"]}

    @classmethod
    def sweeps(cls, samples, fps: float = 60.0, sample_rate: int = 48_000):
        """Per-UI-frame oscilloscope sweeps, decimated the reference's way
        (wave_view.rs:70-123): the audio side copies each 128-block into a
        4096 ring, dropping whole blocks when full (wave_view.rs:159-176);
        each UI frame feeds the ring's fill level (or 0.0 if nothing
        arrived since the last frame) into a 32-tap simple moving average,
        draws min(average, available) samples, and releases them — which
        stabilizes the sweep width against frame-rate jitter.

        Host-side simulation over a rendered signal (this is draw logic,
        not DSP).  Returns a list of np.float32 sweep arrays, one per UI
        frame."""
        import numpy as np
        samples = np.asarray(samples, np.float32).ravel()
        per_frame = sample_rate / float(fps)
        ring: list[np.ndarray] = []         # queued blocks (FIFO of samples)
        avail = 0
        sma: list[float] = []
        out = []
        produced = 0.0
        blocks = [samples[i:i + 128] for i in range(0, len(samples), 128)]
        bi = 0
        while bi < len(blocks) or avail:
            produced += per_frame
            pushed = False
            while bi < len(blocks) and produced >= 128.0:
                blk = blocks[bi]
                produced -= 128.0
                bi += 1
                if avail + len(blk) <= cls.RING:     # else: dropped block
                    ring.append(blk)
                    avail += len(blk)
                    pushed = True
            sma.append(float(avail) if pushed else 0.0)
            if len(sma) > cls.SMA_WINDOW:
                sma.pop(0)
            avg = int(sum(sma) / len(sma)) if sma else 0
            n = max(0, min(avg, avail))
            if n:
                flat = np.concatenate(ring)
                out.append(flat[:n])
                rest = flat[n:]
                ring = [rest] if rest.size else []
                avail = rest.size
            else:
                out.append(np.zeros(0, np.float32))
                if bi >= len(blocks):
                    break                   # drained and SMA decayed to 0
        return out


@register_node(
    title="Spectrogram", cfg_name="spectrogram",
    description="Inspect the volume of individual frequencies over time",
    inputs=("in",), is_sink=True,
    params=(
        FieldSpec("fft_size", 512),
        FieldSpec("buffer_size", 250),
        FieldSpec("lower_bound", 20),
        FieldSpec("upper_bound", 20_000),
    ),
)
class Spectrogram:
    """FFT waterfall (spectrogram.rs:225-269): one column per fft_size
    samples, frequency-bounded."""

    @staticmethod
    def process_seq(params, state, inputs):
        return {}, state

    @staticmethod
    def analyze(params, inputs):
        _, cols = spectrogram(
            inputs["in"], fft_size=int(params["fft_size"]),
            lower_hz=float(params["lower_bound"]),
            upper_hz=float(params["upper_bound"]))
        # the reference keeps a bounded deque of the last buffer_size
        # columns (spectrogram.rs:255-262); n == 0 keeps none (a plain
        # [-0:] slice would keep everything)
        n = int(params["buffer_size"])
        return {"columns": cols[..., -n:, :] if n > 0
                else cols[..., :0, :]}

    @staticmethod
    def frequencies(params):
        """Frequency of each display-grid column for a param set (the
        exponential-position grid the interpolated columns live on;
        host-side, static).  Delegates to the single source of truth in
        ops/fftspec so it can never drift from what analyze() renders."""
        from dsp_stuff_tpu.ops.fftspec import grid_frequencies
        return grid_frequencies(int(params["fft_size"]),
                                float(params["lower_bound"]),
                                float(params["upper_bound"]), 48_000)

    @staticmethod
    def window(columns, params, end_frame: int):
        """The deque's contents as the UI would see them mid-render: the
        reference pushes one column per tick and pops past buffer_size
        (spectrogram.rs:255-262), so after tick ``end_frame`` the buffer
        holds columns [max(0, end-n) : end].  Host-side view over a full
        render's columns (analyze returns the tail; this gives any time
        point)."""
        n = int(params["buffer_size"])
        end = max(0, min(int(end_frame), columns.shape[-2]))
        return columns[..., max(0, end - n) if n > 0 else end:end, :]


@register_node(
    title="Pitch Detector", cfg_name="pitch",
    description="Display the peak pitch of a signal",
    inputs=("in",), is_sink=True,
    params=(
        ParamSpec("power_thresh", 0.0, 1.0, 0.5),
        ParamSpec("clarity_thresh", 0.0, 1.0, 0.5),
        ParamSpec("pick_thresh", 0.0, 1.0, 0.5),
    ),
)
class Pitch:
    """McLeod pitch detection over 1024-sample windows (pitch.rs:115-147)."""

    @staticmethod
    def process_seq(params, state, inputs):
        return {}, state

    @staticmethod
    def analyze(params, inputs):
        return detect_pitch(
            inputs["in"],
            power_threshold=float(params["power_thresh"]),
            clarity_threshold=float(params["clarity_thresh"]),
            pick_threshold=float(params["pick_thresh"]))
