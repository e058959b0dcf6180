"""Multi-chip / multi-host parallelism.

  batch       — dp x sp shard_map programs over a ('data', 'time') Mesh
  distributed — jax.distributed multi-host entry (init_distributed,
                global_mesh, process_local_batch)

Lazy attribute table so `worldtpu.parallel.init_distributed()` works
without importing the (heavy) batch programs first.
"""

_LAZY = {
    "make_mesh": ("worldtpu.parallel.batch", "make_mesh"),
    "MeshConfigError": ("worldtpu.parallel.batch", "MeshConfigError"),
    "batch_copy_synthesis": ("worldtpu.parallel.batch",
                             "batch_copy_synthesis"),
    "batch_wav_to_wav": ("worldtpu.parallel.batch", "batch_wav_to_wav"),
    "batch_harvest_f0": ("worldtpu.parallel.batch", "batch_harvest_f0"),
    "init_distributed": ("worldtpu.parallel.distributed",
                         "init_distributed"),
    "global_mesh": ("worldtpu.parallel.distributed", "global_mesh"),
    "process_local_batch": ("worldtpu.parallel.distributed",
                            "process_local_batch"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(
        f"module 'worldtpu.parallel' has no attribute {name!r}")
