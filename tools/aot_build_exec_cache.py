"""Deviceless AOT builder for the repo-committed ``.exec_cache`` artifacts.

Compiles the bench-critical serve programs for a TPU topology WITHOUT a
TPU attached — ``jax.experimental.topologies`` + the local libtpu
compiler — and stores them in the engine's exec-cache wire format under
the fingerprint a serving host with the same chip kind will compute
(``engine.exec_fingerprint`` normalizes tunneled-TPU platforms to
``tpu`` for exactly this reason). A cold serving/bench host then
deserializes these programs in seconds instead of paying the
multi-minute XLA compile (VERDICT r2 next-round #2).

The TPU-framework analogue of the reference shipping CTranslate2's
pre-built native binaries: here the "binary" is a serialized XLA
executable keyed by (jax version, chip kind, model config, storage
policies, traced source bytes).

Usage (defaults = the driver bench config: whisper-small bf16, the
10 s x 64-row serve batch + the 1 s x 1-row partial path):

    JAX_PLATFORMS=cpu python tools/aot_build_exec_cache.py

Every compile runs on host CPU threads; on a 1-core host expect
minutes per serve program. Artifacts land under --out/<fingerprint>/
and are safe to commit (integrity-hashed; stale fingerprints can never
load).

RUNTIME FORMAT: each PJRT runtime serializes executables in its OWN
wire format, and the fingerprint's runtime half keeps them apart
(engine.exec_runtime_token). The default deviceless topology build
serializes through local libtpu — loadable on direct-libtpu serving
hosts. A host that reaches its TPU through a tunneled PJRT proxy
(axon) can only load blobs serialized by that proxy: build those with

    python tools/aot_build_exec_cache.py --runtime device

on a host with the tunnel up (compiles ride the persistent XLA cache,
so a tree that was already compiled builds fast). A manifest.json in
the fingerprint dir records which runtime built the set.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def parse_shapes(spec: str):
    """``10:64:1,1:1:1`` -> [(10.0, 64, 1), (1.0, 1, 1)]"""
    out = []
    for part in spec.split(","):
        if not part.strip():
            continue
        sec, bsz, beam = part.split(":")
        out.append((float(sec), int(bsz), int(beam)))
    return out


def prune_stale_dirs(out: Path, keep_fp: str) -> list[str]:
    """Enforce the one-fingerprint-dir size policy: a sibling dir's
    fingerprint no longer matches any source tree, so no host can ever
    load it — round 4 left one such 330 MB dir behind when a regen
    commit raced the round boundary. Non-directory entries are left
    alone."""
    pruned = []
    for sib in sorted(out.iterdir()):
        if sib.is_dir() and sib.name != keep_fp:
            shutil.rmtree(sib)
            pruned.append(sib.name)
    return pruned


def main() -> int:
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    parser.add_argument("--model", default="small")
    parser.add_argument("--compute-type", default="bfloat16")
    parser.add_argument("--topology", default="v5e:1x1",
                        help="jax topology name (chip kind must match the "
                             "serving host)")
    parser.add_argument("--runtime", choices=("topology", "device"),
                        default="topology",
                        help="topology: deviceless libtpu build (loads on "
                             "direct-libtpu hosts). device: compile and "
                             "serialize through the real attached backend "
                             "(required for tunneled-PJRT serving hosts — "
                             "their proxy's SerializedExecutable format is "
                             "not libtpu's)")
    parser.add_argument("--shapes", default="10:64:1,1:1:1",
                        help="comma-separated bucket_sec:batch:beam")
    parser.add_argument("--out", default=str(
        Path(__file__).resolve().parents[1] / ".exec_cache"))
    parser.add_argument("--no-pallas", action="store_true",
                        help="build for a use_pallas=False engine")
    parser.add_argument("--max-decode-tokens", type=int, default=224,
                        help="engine max_decode_tokens the artifacts are "
                             "built for (part of the cache fingerprint)")
    parser.add_argument("--include-drafted", action="store_true",
                        help="also build the draft-verified partial "
                             "program per beam-1 shape (partial-serving "
                             "deployments; adds ~one serve-size blob per "
                             "shape, so the committed bench artifacts "
                             "leave it off)")
    parser.add_argument("--keep-stale", action="store_true",
                        help="keep sibling fingerprint dirs under --out "
                             "instead of pruning them after a successful "
                             "build (the committed-artifact size policy is "
                             "ONE fingerprint dir; stale dirs can never be "
                             "loaded — their fingerprint no longer matches "
                             "any source tree)")
    args = parser.parse_args()

    import jax

    if args.runtime == "topology":
        # deviceless: never dial a real device (the TPU tunnel may be down —
        # that is the point of this mode); topologies only need libtpu
        env_plat = os.environ.get("JAX_PLATFORMS", "").strip() or "cpu"
        if jax.config.jax_platforms != env_plat:
            jax.config.update("jax_platforms", env_plat)
    else:
        # device mode: dial whatever backend the environment provides
        # (the tunnel on axon hosts, local libtpu otherwise) and honor an
        # explicit JAX_PLATFORMS the way server main.py does
        env_plat = os.environ.get("JAX_PLATFORMS", "").strip()
        if env_plat and jax.config.jax_platforms != env_plat:
            jax.config.update("jax_platforms", env_plat)
        # compiles that miss the exec cache still ride the persistent XLA
        # cache (same default dir as bench.py/server main)
        xla_cache = os.getenv("STT_XLA_CACHE_DIR", "").strip() or os.path.join(
            os.path.expanduser("~"), ".cache", "stt_tpu_xla")
        if xla_cache.lower() != "off":
            try:
                os.makedirs(xla_cache, exist_ok=True)
                jax.config.update("jax_compilation_cache_dir", xla_cache)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 1.0)
            except Exception:
                pass

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from stt_tpu.engine import engine as E
    from stt_tpu.models import whisper as W

    dtype = jnp.bfloat16 if args.compute_type == "bfloat16" else jnp.float32
    use_pallas = not args.no_pallas

    # Backend-gated kernel policies consult jax.default_backend() at TRACE
    # time; on this CPU build host they silently resolve to OFF while the
    # fingerprint records the env as set — the artifact would mislabel its
    # program. Refuse rather than ship a policy/program mismatch.
    gated_on = [
        name for name, val, off in (
            ("STT_XATTN_KERNEL", W.XATTN_KERNEL, ("off", "0", "false")),
            ("STT_FLASH_ATTENTION", W.FLASH_ATTENTION, ("off",)),
        ) if val not in off
    ]
    if gated_on and jax.default_backend() != "tpu":
        log(f"ERROR: {gated_on} are backend-gated (trace-time "
            "jax.default_backend() check) and cannot be honored by a "
            "deviceless CPU build — the artifact would embed the OFF "
            "program under an ON fingerprint. Unset them, or build on a "
            "TPU host.")
        return 2

    t0 = time.monotonic()
    if args.runtime == "topology":
        topo = topologies.get_topology_desc(
            args.topology, "tpu", chips_per_host_bounds=[1, 1, 1]
        )
        build_devices = list(topo.devices)
        log(f"topology {args.topology}: platform={build_devices[0].platform} "
            f"kind={build_devices[0].device_kind!r} "
            f"devices={len(build_devices)}")
    else:
        build_devices = jax.devices()[:1]
        log(f"device runtime: platform={build_devices[0].platform} "
            f"kind={build_devices[0].device_kind!r} "
            f"version={getattr(build_devices[0].client, 'platform_version', '?')!r}")
    dev = build_devices[0]

    config = W.get_config(args.model)
    fp = E.exec_fingerprint(
        dev, config, dtype, use_pallas, args.max_decode_tokens
    )
    out_dir = Path(args.out) / fp
    log(f"fingerprint {fp} -> {out_dir}")

    # abstract params: shapes/dtypes only, placed on the build devices so
    # the lowering targets the TPU compiler (init_params is jax-traceable)
    mesh = Mesh(np.asarray(build_devices).reshape(len(build_devices)), ("d",))
    repl = NamedSharding(mesh, P())

    def with_sharding(x):
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=repl)

    params_shape = jax.eval_shape(
        lambda: W.init_params(config, seed=0, dtype=dtype)
    )
    # mirror the engine's load-time transforms (fuse THEN quantize)
    params_shape = dict(params_shape)
    params_shape["decoder"] = jax.eval_shape(
        W.fuse_decoder_qkv, params_shape["decoder"]
    )
    if W.DECODER_WEIGHTS_DTYPE not in ("bf16", ""):
        params_shape = dict(params_shape)
        # dtype is a static argument, not an abstract array — close over it
        params_shape["decoder"] = jax.eval_shape(
            lambda d: W.quantize_decoder_weights(d, dtype),
            params_shape["decoder"],
        )
    params = jax.tree.map(with_sharding, params_shape)

    built = []
    for bucket_sec, batch_n, beam in parse_shapes(args.shapes):
        # the placeholder construction and statics are the engine's own
        # (aot_compile_serve_shape) — builder and runtime cannot drift
        enc_key = E.WhisperEngine._enc_exec_key(bucket_sec, batch_n)
        dec_key = E.WhisperEngine._serve_exec_key(bucket_sec, batch_n, beam)
        draft_key = E.WhisperEngine._draft_exec_key(bucket_sec, batch_n)
        want_draft = args.include_drafted and beam <= 1
        t1 = time.monotonic()
        enc_compiled, dec_compiled, draft_compiled = (
            E.aot_compile_serve_shape(
                params, config, dtype, use_pallas,
                bucket_sec, batch_n, beam, args.max_decode_tokens,
                need_draft=want_draft,
                placeholder=with_sharding,
            )
        )
        E.write_exec_blob(out_dir / f"{enc_key}.jexec", enc_compiled)
        E.write_exec_blob(out_dir / f"{dec_key}.jexec", dec_compiled)
        built.extend((enc_key, dec_key))
        if draft_compiled is not None:
            E.write_exec_blob(out_dir / f"{draft_key}.jexec", draft_compiled)
            built.append(draft_key)
        log(f"built {' + '.join(built[-3 if want_draft else -2:])} "
            f"in {time.monotonic() - t1:.1f}s")

    pruned = [] if args.keep_stale else prune_stale_dirs(Path(args.out), fp)
    for name in pruned:
        log(f"pruned stale fingerprint dir {name}")

    sizes = {k: (out_dir / f"{k}.jexec").stat().st_size for k in built}

    # manifest: lets the committed-artifact guard test verify the SOURCE
    # half of the fingerprint on any host (the runtime half needs the
    # builder's live client, which a CPU test host may not have). A second
    # invocation into the same fingerprint dir merges its artifact list.
    manifest_path = out_dir / "manifest.json"
    manifest = {}
    if manifest_path.is_file():
        try:
            manifest = json.loads(manifest_path.read_text())
        except ValueError:
            manifest = {}
    kind = dev.device_kind
    platform = "tpu" if kind.startswith("TPU") else dev.platform
    manifest.update({
        "fingerprint": fp,
        "source_fp": E.exec_source_fingerprint(
            f"{platform}/{kind}", config, dtype, use_pallas,
            args.max_decode_tokens),
        "runtime_token": E.exec_runtime_token(dev),
        "platform_version": getattr(
            getattr(dev, "client", None), "platform_version", ""),
        "runtime_mode": args.runtime,
        "device_kind": kind,
        "model": args.model,
        "compute_type": args.compute_type,
        "max_decode_tokens": args.max_decode_tokens,
    })
    manifest.setdefault("artifacts", {}).update(sizes)
    manifest_path.write_text(json.dumps(manifest, indent=1, sort_keys=True))

    print(json.dumps({
        "fingerprint": fp,
        "out": str(out_dir),
        "runtime": args.runtime,
        "topology": args.topology if args.runtime == "topology" else None,
        "device_kind": dev.device_kind,
        "artifacts": sizes,
        "pruned_stale_dirs": pruned,
        "wall_s": round(time.monotonic() - t0, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
