"""End-to-end LDDMM atlas training on the real TPU chip: N synthetic 3D
volumes, a few epochs, wall-clock + convergence report.

This is also the north-star runner (BASELINE.json config 4, the analogue of
the reference's production atlas workload, reference lddmm.py:343-375):
``python scripts/atlas_e2e_tpu.py 128 128 4 5`` with LM_IMG_DTYPE=bfloat16
trains a 128-subject 128^3 atlas on one chip.  Set LM_E2E_OUT=<path> to
dump the full record (per-epoch walls + losses) as JSON for BASELINE.md.
"""
import json
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import lagomorph_tpu as lm

res = int(sys.argv[1]) if len(sys.argv) > 1 else 64
n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
bs = int(sys.argv[3]) if len(sys.argv) > 3 else 8
epochs = int(sys.argv[4]) if len(sys.argv) > 4 else 3

rng = np.random.default_rng(0)
grid = np.stack(np.meshgrid(*[np.arange(res, dtype=np.float64)] * 3, indexing="ij"))
c = (res - 1) / 2
# subject spread and learning rates are env-tunable: the defaults make a
# mild, fast-converging population; the north-star record uses a larger
# offset spread (LM_OFF) so the pose solve has real work to show a curve
off_scale = float(os.environ.get("LM_OFF", "2"))
imgs = []
for _ in range(n):
    off = rng.uniform(-off_scale, off_scale, 3)
    w = res / 6 * (1 + 0.1 * rng.standard_normal())
    r2 = sum((grid[d] - c - off[d]) ** 2 for d in range(3))
    imgs.append(np.exp(-r2 / (2 * w**2)))
imgs = np.stack(imgs)[:, None].astype(np.float32)

builder = lm.LDDMMAtlasBuilder(
    list(imgs),
    num_epochs=epochs,
    batch_size=bs,
    lddmm_integration_steps=int(os.environ.get("LM_T", "5")),
    reg_weight=1e-2,
    learning_rate_pose=float(os.environ.get("LM_LR_POSE", "1e-3")),
    learning_rate_image=float(os.environ.get("LM_LR_IMAGE", "50.0")),
    metric=lm.FluidMetric([0.05, 0.0, 0.05]),
    keep_data_on_device=os.environ.get("LM_ON_DEVICE", "1") == "1",
    loader_workers=int(os.environ.get("LM_WORKERS", "0")),
    image_dtype=os.environ.get("LM_IMG_DTYPE") or None,
    progress_bar=False,
)
builder.initialize()
t0 = time.perf_counter()
# run epoch-by-epoch so first-epoch compile is separable from steady state
epoch_walls = []
for builder._epoch in range(epochs):
    te = time.perf_counter()
    el, er = builder.epoch()
    builder.epoch_losses.append(el)
    builder.epoch_reg_terms.append(er)
    epoch_walls.append(time.perf_counter() - te)
t1 = time.perf_counter()
print(f"res={res} n={n} bs={bs} epochs={epochs}")
print(f"wall: {t1-t0:.1f}s total, {(t1-t0)/epochs:.1f}s/epoch "
      f"(per-epoch: {', '.join(f'{w:.1f}' for w in epoch_walls)}; "
      f"steady-state = later epochs, first includes compile)")
print("epoch losses:", [f"{l:.6f}" for l in builder.epoch_losses])
out = os.environ.get("LM_E2E_OUT")
if out:
    with open(out, "w") as f:
        json.dump(
            {
                "res": res, "n": n, "bs": bs, "epochs": epochs,
                "image_dtype": os.environ.get("LM_IMG_DTYPE") or "float32",
                "keep_data_on_device": builder.keep_data_on_device,
                "wall_total_s": round(t1 - t0, 2),
                "epoch_walls_s": [round(w, 2) for w in epoch_walls],
                "steady_state_s_per_epoch": round(
                    float(np.mean(epoch_walls[1:] or epoch_walls)), 2
                ),
                "epoch_losses": builder.epoch_losses,
                "epoch_reg_terms": builder.epoch_reg_terms,
            },
            f, indent=1,
        )
    print("wrote", out)
# non-increasing with tolerance: near a fixed point successive epoch losses
# can agree to ~1e-9 and a strict < is flaky
assert builder.epoch_losses[-1] <= builder.epoch_losses[0] * (1 + 1e-6)
print("converging OK")
