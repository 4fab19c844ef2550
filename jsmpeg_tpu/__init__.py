"""jsmpeg_tpu: a TPU-native MPEG1/MP2 decode engine.

Capability-equivalent to phoboslab/jsmpeg (MPEG-TS demux, MPEG1 video,
MP2 audio, players/sources/renderers), re-designed TPU-first: serial
bitstream parsing on host, batched integer transform/motion/color kernels
on device via JAX/XLA/Pallas, GOP- and tile-parallel scaling over device
meshes.
"""

__version__ = '0.1.0'
