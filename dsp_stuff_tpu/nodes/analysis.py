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
    full averaged input signal."""

    @staticmethod
    def process_seq(params, state, inputs):
        return {}, state

    @staticmethod
    def analyze(params, inputs):
        return {"samples": inputs["in"]}


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
        host-side, static)."""
        import numpy as np
        from dsp_stuff_tpu.ops.fftspec import (_kept_bins,
                                               exponential_positions)
        fft_size = int(params["fft_size"])
        freqs, keep = _kept_bins(fft_size, float(params["lower_bound"]),
                                 float(params["upper_bound"]), 48_000)
        pos = exponential_positions(keep.size)
        grid = np.linspace(0.0, 1.0, keep.size)
        return np.asarray(np.interp(grid, pos, freqs[keep]), np.float32)

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
