"""TPU-native acoustic-swarm speech framework.

Joint 2D speaker localization + source separation for distributed
microphone swarms, rebuilt TPU-first in JAX/XLA (see README.md).

Public API mirrors the reference system's entry points
(/root/reference/sep/Mic_Array.py, sep/training/JointModel, sep/eval):

    from acousticswarms_speech_tpu import JointPipeline, MicArray
    from acousticswarms_speech_tpu.models import SpotNet, SepNet
    from acousticswarms_speech_tpu.pipeline.evaluate import evaluate_dataset
"""

__version__ = "0.1.0"

# Intentionally lazy: importing the package should not pull jax/flax until a
# component is used (keeps CLI tools like the analyzer light).


def __getattr__(name):
    if name == "JointPipeline":
        from .pipeline.joint import JointPipeline

        return JointPipeline
    if name == "MicArray":
        from .pipeline.mic_array import MicArray

        return MicArray
    if name == "constants":
        from . import constants

        return constants
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
