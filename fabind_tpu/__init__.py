"""fabind_tpu: TPU-native FABind/FABind+ docking framework (JAX/XLA/Pallas)."""

from fabind_tpu.config import FABindConfig, ModelConfig, ShapeConfig, TrainConfig, preset

__version__ = "0.3.0"


def __getattr__(name):
    # lazy: serve pulls in jax/flax; keep bare `import fabind_tpu` light
    if name in ("DockingEngine", "Pose"):
        from fabind_tpu import serve
        return getattr(serve, name)
    raise AttributeError(name)
