"""Node library: every node type of the reference, in registration order of
nodes/mod.rs:65-90.  Importing this package registers all types."""

from dsp_stuff_tpu.nodes import io_nodes    # Input, Output
from dsp_stuff_tpu.nodes import simple      # Gain, Mix, Mux, Demux, Add
from dsp_stuff_tpu.nodes import shapers     # Distort, Overdrive, Muff, Chebyshev
from dsp_stuff_tpu.nodes import filters     # BiQuad, LowPass, HighPass, Envelope, Fir
from dsp_stuff_tpu.nodes import delay       # Reverb (feedback echo)
from dsp_stuff_tpu.nodes import gen         # SignalGen
from dsp_stuff_tpu.nodes import analysis    # WaveView, Spectrogram, Pitch
