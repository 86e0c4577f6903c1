"""Dump the compiled (optimized) HLO of the whole-frame gradient and rank
its cost centers: top fusions by output bytes, transpose/copy ops, and
lane-flipped layouts ({...,N} minor dims < 8 on the 128-lane axis).

Usage: python tools/hlo_dump.py [out.txt] [--fwd]
Writes the full HLO text to out.txt (default /tmp/grad_hlo.txt) and prints
a ranked summary. Run on the TPU backend (the layout assignment under
inspection is the TPU one).
"""
import re
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from bench import build_workload
    from ray_tracer_tpu.renderer import camera_basis, render_frame

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/grad_hlo.txt"
    fwd_only = "--fwd" in sys.argv

    scene, cam, params = build_workload()
    basis = camera_basis(cam.replace(aspect=params.aspect))

    leaves, treedef = jtu.tree_flatten(scene)
    is_f = [hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
            for l in leaves]
    float_leaves = [l for l, m in zip(leaves, is_f) if m]

    def merged(fl):
        it = iter(fl)
        return jtu.tree_unflatten(
            treedef, [next(it) if m else l for l, m in zip(leaves, is_f)])

    target = jnp.zeros((params.height, params.width, 3), jnp.float32)

    def loss_fn(fl):
        img = render_frame(merged(fl), basis, params, jnp.int32(0))
        return jnp.mean((img - target) ** 2)

    if fwd_only:
        prog = jax.jit(loss_fn)
    else:
        prog = jax.jit(lambda fl: jax.grad(loss_fn)(fl))

    lowered = prog.lower(float_leaves)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)/1e6:.1f} MB of HLO to {out_path}")

    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print(f"cost_analysis: flops={ca.get('flops', 0):.3e} "
          f"bytes={ca.get('bytes accessed', 0):.3e}")

    # ---- parse op lines: "  %name = f32[4,2073600,3]{...} op-name(...)"
    shape_re = re.compile(
        r"^\s*(?:ROOT\s+)?%?([\w.\-]+) = ([a-z0-9]+)\[([0-9,]*)\]"
        r"(?:\{([^}]*)\})? (\w+)")
    DT = {"f32": 4, "s32": 4, "u32": 4, "pred": 1, "bf16": 2, "f16": 2,
          "u8": 1, "s8": 1, "u64": 8, "s64": 8}

    def nbytes(dt, dims):
        n = DT.get(dt, 4)
        for d in dims:
            n *= d
        return n

    # Only ops OUTSIDE %fused_computation bodies are materialized buffers
    # (fusion-internal ops live in registers/VMEM); track the enclosing
    # computation as we scan.
    comp_re = re.compile(r"^%?([\w.\-]+) \([^)]*\) -> .* \{")
    ops = []
    comp = ""
    for line in txt.splitlines():
        cm = comp_re.match(line)
        if cm:
            comp = cm.group(1)
            continue
        if line.startswith("}"):
            comp = ""
            continue
        m = shape_re.match(line)
        if not m:
            continue
        if "fused_computation" in comp:
            continue
        name, dt, dims_s, layout, opname = m.groups()
        dims = [int(x) for x in dims_s.split(",")] if dims_s else []
        ops.append((name, dt, dims, layout or "", opname,
                    nbytes(dt, dims)))

    big = sorted(ops, key=lambda o: -o[5])[:30]
    print("\n== top-30 ops by OUTPUT bytes ==")
    for name, dt, dims, layout, opname, nb in big:
        print(f"{nb/1e6:9.1f} MB  {opname:12s} {dt}{dims} "
              f"{{{layout}}}  %{name[:60]}")

    print("\n== transposes / copies / reshapes over 8 MB ==")
    tot = 0
    for name, dt, dims, layout, opname, nb in ops:
        if opname in ("transpose", "copy", "reshape", "bitcast") \
                and nb > 8e6:
            tot += nb
            print(f"{nb/1e6:9.1f} MB  {opname:10s} {dt}{dims} "
                  f"{{{layout}}}  %{name[:60]}")
    print(f"total: {tot/1e6:.0f} MB")

    # lane-flip detector: rank>=2 arrays whose MINOR layout dim has size
    # < 8 (padded to (8,128) tiles = up to 128x waste)
    print("\n== lane-flipped buffers (minor dim < 8, >4 MB logical) ==")
    tot = 0
    n = 0
    for name, dt, dims, layout, opname, nb in ops:
        if len(dims) < 2 or nb < 4e6 or not layout:
            continue
        mins = layout.split(",")[0].strip()
        if not mins.isdigit():
            continue
        minor = dims[int(mins)] if int(mins) < len(dims) else 0
        if 0 < minor < 8:
            n += 1
            tot += nb
            if n <= 20:
                print(f"{nb/1e6:9.1f} MB  {opname:12s} {dt}{dims} "
                      f"{{{layout}}}  %{name[:60]}")
    print(f"total {n} buffers, {tot/1e6:.0f} MB logical")


if __name__ == "__main__":
    main()
