"""Serving export: freeze the trained detector into a portable AOT artifact.

The reference has no deployment story — serving its detector means carrying
the full torch + diffusers 0.8.0 stack and re-monkey-patching attention at
process start (reference optimize_token.py:24-78, ptp_utils.py:472-573).
Here the complete detector — frozen SD weights, learned context embedding,
selected token indices, optional stage-4 regressor, and the whole test-time
augmentation ensemble + on-device keypoint extraction (reference
eval.py:197-355, 447-453) — is traced ONCE and serialized with `jax.export`
into a self-contained StableHLO artifact:

  * weights are baked in as constants: the artifact needs no checkpoint,
    no conversion code, and none of this framework at load time — only jax;
  * multi-platform lowering (e.g. cpu + tpu) bakes both code paths into one
    artifact, so the same file serves on a dev CPU and a TPU pod frontend;
  * the calling convention is pinned and versioned by jax.export itself
    (forward compatibility window), manifest.json records shapes/semantics.

Artifact layout (a directory):
    detector_b{N}.stablehlo   one serialized jax.export blob per exported
                              batch shape (XLA programs are static-shape;
                              N blobs share the baked weights' source but
                              each is an independent program)
    manifest.json             shapes, outputs, platforms, versions

Exported signature (per batch shape):
    f(images: f32[batch, S, S, 3] in [0, 1], seed: u32[]) ->
        {"keypoints": f32[batch, k, 2]}            normalized (y, x)
      + {"regressed": f32[batch, K, 2]}            when a stage-4 regressor
                                                    is baked in (eval.py:453)

Shape contract: inputs must exactly match one exported batch shape —
`ServedDetector.detect` dispatches on images.shape[0] and raises (listing
the available shapes) otherwise. Export the batch sizes you will serve
(e.g. --batch 1,4,8); there is no implicit padding.

CLI:
    python -m stablekeypoints_tpu.serving --save_folder outputs \
        --out outputs/serving --batch 1,4 [--platforms cpu,tpu] [--check]
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from stablekeypoints_tpu.config import Config
from stablekeypoints_tpu.pipeline.runtime import Runtime

__all__ = ["export_detector", "ServedDetector"]

_MANIFEST = "manifest.json"
_FORMAT_VERSION = 2  # v2: multi-batch-shape artifacts (detector_b{N}.stablehlo)


def _blob_name(batch: int) -> str:
    return f"detector_b{batch}.stablehlo"


def _single_device_runtime(rt: Runtime) -> Runtime:
    """A view of `rt` whose mesh is one device (the serving unit).

    Multi-chip meshes are a training concern; an exported detector is a
    per-replica program (scale-out at serving time is N independent
    replicas behind a load balancer, not one sharded program). Modules are
    re-cloned without a kernel mesh so no shard_map lands in the export.
    """
    if rt.mesh.devices.size == 1:
        return rt
    dev = rt.mesh.devices.flat[0]
    mesh = jax.sharding.Mesh(np.asarray([dev]).reshape(1, 1), ("data", "model"))
    host = jax.device_get((rt.unet_params, rt.vae_params))
    return dataclasses.replace(
        rt,
        mesh=mesh,
        unet=rt.unet.clone(mesh=None),
        vae=rt.vae.clone(mesh=None),
        vae_loop=rt.vae_loop.clone(mesh=None) if rt.vae_loop is not None else None,
        unet_params=host[0],
        vae_params=host[1],
    )


def export_detector(
    runtime: Runtime,
    context: np.ndarray,
    indices: np.ndarray,
    out_dir: str,
    batch: "int | Sequence[int]" = 1,
    regressor: Optional[np.ndarray] = None,
    platforms: Optional[Sequence[str]] = None,
) -> dict:
    """Export the detection path to `out_dir`; returns the manifest dict.

    context: [1, T, d] learned embedding (stage 1); indices: [k] selected
    token indices (stage 2); regressor: optional [2k, 2K] stage-4 linear
    map — when given, the artifact also emits regressed keypoints
    (((x - 0.5) @ W) + 0.5, reference eval.py:453). `batch` may be an int
    or a sequence of batch sizes: one blob is exported per size and
    ServedDetector dispatches on the input's leading dim.
    """
    batches = sorted(
        {int(b) for b in ((batch,) if isinstance(batch, (int, np.integer)) else batch)}
    )
    if not batches or any(b < 1 for b in batches):
        raise ValueError(f"batch sizes must be positive ints, got {batch!r}")
    ert = _single_device_runtime(runtime)
    size = ert.cfg.image_size
    ctx = jnp.asarray(np.asarray(context), jnp.float32)
    idx = jnp.asarray(np.asarray(indices), jnp.int32)
    reg = None if regressor is None else jnp.asarray(np.asarray(regressor), jnp.float32)
    if reg is not None and reg.shape[0] != 2 * idx.shape[0]:
        raise ValueError(
            f"regressor rows {reg.shape[0]} != 2 * top_k {2 * idx.shape[0]}"
        )

    def fn(images, seed):
        key = jax.random.PRNGKey(seed)
        pts = ert._ensembled_keypoints(
            ert.unet_params, ert.vae_params, ctx, images, idx, key
        )
        out = {"keypoints": pts}
        if reg is not None:
            flat = pts.reshape(pts.shape[0], -1) - 0.5
            out["regressed"] = (flat @ reg + 0.5).reshape(pts.shape[0], -1, 2)
        return out

    kwargs = {} if platforms is None else {"platforms": list(platforms)}
    os.makedirs(out_dir, exist_ok=True)
    blob_info = {}
    exported = None
    for b in batches:
        args = (
            jax.ShapeDtypeStruct((b, size, size, 3), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.uint32),
        )
        exported = jax.export.export(jax.jit(fn), **kwargs)(*args)
        blob = exported.serialize()
        with open(os.path.join(out_dir, _blob_name(b)), "wb") as f:
            f.write(blob)
        blob_info[str(b)] = {"file": _blob_name(b), "bytes": len(blob)}

    manifest = {
        "format_version": _FORMAT_VERSION,
        "batches": batches,
        "blobs": blob_info,
        "image_size": int(size),
        "top_k": int(idx.shape[0]),
        "num_regressed": None if reg is None else int(reg.shape[1] // 2),
        "outputs": ["keypoints"] + (["regressed"] if reg is not None else []),
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "calling_convention_version": exported.calling_convention_version,
        "model_type": ert.cfg.model_type,
        "augmentation_iterations": int(ert.cfg.augmentation_iterations),
        "max_loc_strategy": ert.cfg.max_loc_strategy,
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ServedDetector:
    """Load + run an exported detector. Needs only jax (no framework code,
    no checkpoint: weights live in the artifact)."""

    def __init__(self, exported_by_batch: dict, manifest: dict):
        self.exported_by_batch = exported_by_batch  # {batch: jax.export.Exported}
        self.manifest = manifest

    @staticmethod
    def load(out_dir: str) -> "ServedDetector":
        with open(os.path.join(out_dir, _MANIFEST)) as f:
            manifest = json.load(f)
        if "batches" in manifest:  # v2 multi-shape
            names = {int(b): info["file"] for b, info in manifest["blobs"].items()}
        else:  # v1 single-shape artifact (detector.stablehlo)
            names = {int(manifest["batch"]): "detector.stablehlo"}
        exported_by_batch = {}
        for b, name in names.items():
            with open(os.path.join(out_dir, name), "rb") as f:
                exported_by_batch[b] = jax.export.deserialize(bytearray(f.read()))
        return ServedDetector(exported_by_batch, manifest)

    def detect(self, images: np.ndarray, seed: int = 0) -> dict:
        """images: [batch, S, S, 3] float in [0, 1] -> dict of np arrays
        ("keypoints" [batch, k, 2]; "regressed" [batch, K, 2] if baked).
        batch must exactly match one exported batch size (no padding)."""
        m = self.manifest
        images = np.asarray(images, np.float32)
        size = m["image_size"]
        avail = sorted(self.exported_by_batch)
        if (
            images.ndim != 4
            or images.shape[1:] != (size, size, 3)
            or images.shape[0] not in self.exported_by_batch
        ):
            raise ValueError(
                f"exported for images of shape [b, {size}, {size}, 3] with "
                f"b in {avail}, got {images.shape}"
            )
        exported = self.exported_by_batch[images.shape[0]]
        out = exported.call(jnp.asarray(images), jnp.uint32(seed))
        return {k: np.asarray(v) for k, v in out.items()}


def main(argv: Optional[Sequence[str]] = None) -> int:
    import argparse

    from stablekeypoints_tpu.utils.artifacts import load_artifact

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--save_folder", required=True,
                   help="stage artifacts (embedding/indices[/regressor])")
    p.add_argument("--out", required=True, help="output artifact directory")
    p.add_argument("--batch", default="1",
                   help="batch size(s) to export, comma-separated (e.g. 1,4,8); "
                        "one blob per size, dispatched at serve time")
    p.add_argument("--platforms", default="",
                   help="comma-separated lowering platforms (e.g. cpu,tpu); "
                        "empty = current backend")
    p.add_argument("--with_regressor", action="store_true",
                   help="bake the stage-4 regressor in (emits 'regressed')")
    p.add_argument("--check", action="store_true",
                   help="roundtrip-load the artifact and compare against the "
                        "live runtime on random inputs")
    p.add_argument("--model_path", default="")
    p.add_argument("--model_type", default=Config.model_type)
    p.add_argument("--image_size", type=int, default=Config.image_size)
    p.add_argument("--augmentation_iterations", type=int,
                   default=Config.augmentation_iterations)
    a = p.parse_args(argv)

    cfg = Config(
        model_path=a.model_path, model_type=a.model_type,
        image_size=a.image_size,
        augmentation_iterations=a.augmentation_iterations,
    )
    rt = Runtime.create(cfg)
    context = load_artifact(a.save_folder, "embedding")
    indices = load_artifact(a.save_folder, "indices").astype(np.int32)
    regressor = load_artifact(a.save_folder, "regressor") if a.with_regressor else None
    platforms = [s for s in a.platforms.split(",") if s] or None
    batches = [int(s) for s in str(a.batch).split(",") if s]
    manifest = export_detector(
        rt, context, indices, a.out, batch=batches, regressor=regressor,
        platforms=platforms,
    )
    print(json.dumps(manifest))

    if a.check:
        det = ServedDetector.load(a.out)
        rng = np.random.default_rng(0)
        for b in batches:
            imgs = rng.uniform(
                0, 1, (b, cfg.image_size, cfg.image_size, 3)
            ).astype(np.float32)
            served = det.detect(imgs, seed=3)["keypoints"]
            live = np.asarray(
                rt.augmented_keypoints_fn(
                    jnp.asarray(context, jnp.float32), imgs,
                    jnp.asarray(indices, jnp.int32), jax.random.PRNGKey(np.uint32(3)),
                )
            )
            diff = float(np.abs(served - live).max())
            print(json.dumps({"batch": b, "check_max_abs_diff": diff}))
            if not diff < 1e-4:
                return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
