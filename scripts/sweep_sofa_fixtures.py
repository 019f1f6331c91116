"""Randomized SOFA-fixture audit of the loader's convention handling.

Round 5's hand reviews found two real SOFA bugs (assumed ear order;
radian receivers read as degrees). This audit generates random
SimpleFreeField-style files sweeping the encoding matrix —

- SourcePosition units degree/radian (mixed-case attr strings)
- shuffled measurement row order (the slot-based ring grid must
  reassemble it)
- ReceiverPosition absent / cartesian / spherical in degrees or
  radians, in (L, R) or (R, L) order, 2-D or SOFA's 3-D (R, C, I) shape
- 1–3 elevation rings, varying ring azimuth counts, taps 64/128

— then loads each file (decompose=False) and asserts every measurement
lands at the right (elev, az-slot) with the right ear order, bit-close
to the written IR.

Usage: PYTHONPATH=. python scripts/sweep_sofa_fixtures.py [N] [seed]
"""
from __future__ import annotations

import random
import sys
import tempfile
from pathlib import Path

import numpy as np

from tinaural.data.loaders import load_hrir_set

GATE_DB = 120.0  # loading is lossless up to float32 storage


def snr_db(ref, y) -> float:
    ref = np.asarray(ref, np.float64)
    y = np.asarray(y, np.float64)
    err = np.sum((ref - y) ** 2)
    return 300.0 if err == 0 else 10 * np.log10(np.sum(ref**2) / err)


def main() -> int:
    import h5py

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    rng = random.Random(seed)
    nprng = np.random.default_rng(seed)
    tmp = Path(tempfile.mkdtemp(prefix="sofa_fuzz_"))
    failures = []

    for i in range(n):
        taps = rng.choice([64, 128])
        n_rings = rng.choice([1, 2, 3])
        elevs = sorted(rng.sample([-30.0, -10.0, 0.0, 10.0, 30.0, 50.0],
                                  n_rings))
        counts = [rng.choice([4, 6, 8, 12]) for _ in range(n_rings)]

        # ground truth per measurement: (elev, internal az, (2, taps) IR)
        rows = []
        for e, c in zip(elevs, counts):
            spacing = 360.0 / c
            for a_i in range(c):
                az_int = a_i * spacing  # internal CW convention
                ir = nprng.standard_normal((2, taps)) * 0.3
                ir[0, : taps // 2] += 0.5  # make ears distinguishable
                rows.append((e, az_int, ir))
        order = list(range(len(rows)))
        rng.shuffle(order)  # the file need not be sorted

        # encode: SOFA azimuth is CCW (az_sofa = 360 − az_int)
        deg_pos = np.array([[(360.0 - rows[j][1]) % 360.0, rows[j][0], 1.4]
                            for j in order])
        src_radians = rng.random() < 0.4
        pos = deg_pos.copy()
        units = rng.choice(["degree, degree, metre", "Degree, degree, metre"])
        if src_radians:
            pos[:, :2] = np.radians(pos[:, :2])
            units = rng.choice(["radian, radian, metre", "Radians"])
        ir_arr = np.stack([rows[j][2] for j in order])

        # receiver encoding: None / cartesian / spherical (deg or rad),
        # correct (L, R) or swapped (R, L) order, 2-D or (R, C, I) 3-D
        rcv_kind = rng.choice(["none", "cart", "sph_deg", "sph_rad"])
        swapped = rng.random() < 0.5 and rcv_kind != "none"
        if swapped:
            ir_arr = ir_arr[:, ::-1]  # file lists the RIGHT ear first
        path = tmp / f"fuzz_{i}.sofa"
        with h5py.File(path, "w") as f:
            f["Data.IR"] = ir_arr
            sp = f.create_dataset("SourcePosition", data=pos)
            sp.attrs["Type"] = np.bytes_("spherical")
            sp.attrs["Units"] = np.bytes_(units)
            f["Data.SamplingRate"] = (np.array([44100.0])
                                      if rng.random() < 0.5 else 44100.0)
            if rcv_kind != "none":
                if rcv_kind == "cart":  # +y = listener's LEFT
                    rp_dat = np.array([[0.0, 0.09, 0.0], [0.0, -0.09, 0.0]])
                    rp_t, rp_u = "cartesian", "metre"
                elif rcv_kind == "sph_deg":
                    rp_dat = np.array([[90.0, 0.0, 0.09],
                                       [270.0, 0.0, 0.09]])
                    rp_t, rp_u = "spherical", "degree, degree, metre"
                else:
                    rp_dat = np.array([[np.pi / 2, 0.0, 0.09],
                                       [3 * np.pi / 2, 0.0, 0.09]])
                    rp_t, rp_u = "spherical", "radian, radian, metre"
                if swapped:
                    rp_dat = rp_dat[::-1]
                if rng.random() < 0.3:  # SOFA's (R, C, I) 3-D shape
                    rp_dat = rp_dat[..., None]
                rp = f.create_dataset("ReceiverPosition", data=rp_dat)
                rp.attrs["Type"] = np.bytes_(rp_t)
                rp.attrs["Units"] = np.bytes_(rp_u)

        try:
            t = load_hrir_set(str(path), decompose=False)
        except Exception as e:  # noqa: BLE001 — any crash is a finding
            failures.append((f"[{i}] load crashed: {type(e).__name__}: "
                             f"{str(e)[:120]}", -999.0))
            print(f"[{i + 1}/{n}] LOAD CRASH {type(e).__name__} "
                  f"(rings={n_rings} counts={counts} src_rad={src_radians} "
                  f"rcv={rcv_kind} swapped={swapped})", flush=True)
            continue

        # every measurement must land at its (elev, slot) with (L, R) order
        worst = 300.0
        tel = np.asarray(t.elevs)
        for e, az_int, ir in rows:
            e_i = int(np.argmin(np.abs(tel - e)))
            c = int(t.az_counts[e_i])
            a_i = int(round(az_int / (360.0 / c))) % c
            got = np.asarray(t.h[e_i, a_i], np.float64)
            db = snr_db(ir, got[:, :taps])
            worst = min(worst, db)
        ok = worst >= GATE_DB and t.sample_rate == 44100
        print(f"[{i + 1}/{n}] worst {worst:.1f} dB "
              f"{'ok' if ok else 'FAIL'} (rings={n_rings} counts={counts} "
              f"src_rad={src_radians} rcv={rcv_kind} swapped={swapped})",
              flush=True)
        if not ok:
            failures.append((f"[{i}] rings={n_rings} src_rad={src_radians} "
                             f"rcv={rcv_kind} swapped={swapped}", worst))

    if failures:
        print(f"\nFAIL: {len(failures)} fixture points:")
        for mode, db in failures[:20]:
            print(f"  {mode}  {db:.1f} dB")
        return 1
    print(f"\nPASS: {n} random SOFA fixtures, all ≥ {GATE_DB} dB at the "
          "right slots with the right ear order")
    return 0


if __name__ == "__main__":
    sys.exit(main())
