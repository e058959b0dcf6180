#!/usr/bin/env python
"""Bisect the config-1 quality margin (VERDICT r3 item 6).

vuv_agreement vs the C++ dumps moved 1.0 (r2) -> 0.9983 (r3); candidates
are the r3 default changes: CONV=matmul (bf16 band filters), the Pallas
refine dedup (REFINE_DEDUP_TOL=0.004), and the fused zc sweeps.  Each
combo runs in a SUBPROCESS (knobs bind at import, see worldtpu.flags) and
reports F0 RMSE + vuv agreement vs the reference dump on the config-1
utterance.

Usage: python tools/bisect_quality.py            # run all combos
       WORLDTPU_BISECT_COMBO=json python ...     # one combo (internal)
"""

import json
import os
import pathlib
import subprocess
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

COMBOS = [
    ("default", {}),
    ("conv=conv", {"WORLDTPU_CONV": "conv"}),
    ("dedup=0", {"WORLDTPU_BISECT_DEDUP": "0"}),
    ("zc=0", {"WORLDTPU_ZC": "0"}),
    ("refine=0", {"WORLDTPU_REFINE": "0"}),
    ("conv=conv,dedup=0", {"WORLDTPU_CONV": "conv",
                           "WORLDTPU_BISECT_DEDUP": "0"}),
    # stronger dedup (r5: dedup HELPS C++ fidelity — probe how far)
    ("dedup=0.008", {"WORLDTPU_BISECT_DEDUP": "0.008"}),
    ("dedup=0.012", {"WORLDTPU_BISECT_DEDUP": "0.012"}),
    ("dedup=0.02", {"WORLDTPU_BISECT_DEDUP": "0.02"}),
]


def run_one(wav_path, f0ref_path):
    import jax
    import jax.numpy as jnp
    from worldtpu.analysis import harvest as H
    from worldtpu.analysis.harvest import HarvestKernel
    from worldtpu.io import wav as wav_io

    dd = os.environ.get("WORLDTPU_BISECT_DEDUP")
    if dd is not None:
        H.REFINE_DEDUP_TOL = float(dd)
    x, fs, _ = wav_io.wavread(wav_path)
    hk = HarvestKernel(fs, len(x), f0_floor=40.0)
    f0, _ = hk.compute(jnp.asarray(x, jnp.float32), dtype=jnp.float32)
    f0 = np.asarray(f0)
    ref = np.load(f0ref_path)
    n = min(len(f0), len(ref))
    f0, ref = f0[:n], ref[:n]
    both = (f0 > 0) & (ref > 0)
    rmse = float(np.sqrt(np.mean((f0[both] - ref[both]) ** 2))) if both.any() else 0.0
    vuv = float(np.mean((f0 > 0) == (ref > 0)))
    print(json.dumps({"f0_rmse_hz": round(rmse, 6),
                      "vuv_agreement": round(vuv, 6),
                      "n_disagree": int(np.sum((f0 > 0) != (ref > 0)))}))


def main():
    work = pathlib.Path(tempfile.mkdtemp(prefix="worldtpu_bisect_"))
    from bench import build_reference, synth_utterance
    from worldtpu.io import params as params_io
    from worldtpu.io import wav as wav_io

    fs = 16000
    x = synth_utterance(fs, 3.0, 160.0, 0)
    wav_path = work / "u16.wav"
    wav_io.wavwrite(wav_path, x.astype(np.float64), fs)

    _, dump_bin = build_reference()
    if dump_bin is None:
        sys.exit("bisect_quality: cannot build the C++ reference dumper "
                 "(needs /root/reference and g++); no reference to "
                 "bisect against")
    subprocess.run([str(dump_bin), str(wav_path), str(work / "q"), "5.0"],
                   check=True, capture_output=True, timeout=600,
                   cwd=str(work))
    f0_ref, _, _ = params_io.read_f0(work / "q.f0")
    f0ref_path = work / "f0_ref.npy"
    np.save(f0ref_path, np.asarray(f0_ref))

    for name, env in COMBOS:
        e = dict(os.environ)
        e.update(env)
        e["WORLDTPU_BISECT_COMBO"] = json.dumps([str(wav_path),
                                                 str(f0ref_path)])
        r = subprocess.run([sys.executable, __file__], env=e,
                           capture_output=True, text=True, timeout=1200)
        line = (r.stdout.strip().splitlines() or ["<no output>"])[-1]
        print(f"{name:24s} {line}")
        if r.returncode != 0:
            print(r.stderr[-500:])


if __name__ == "__main__":
    combo = os.environ.get("WORLDTPU_BISECT_COMBO")
    if combo:
        run_one(*json.loads(combo))
    else:
        main()
