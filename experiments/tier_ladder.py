"""Explore tier ladders: padded splat-list width S vs real cells for the
bench scene's area distribution (/tmp/area.npy)."""
import numpy as np

area = np.load("/tmp/area.npy")
area = area[area > 0]
real = int(area.sum())
print(f"visible={len(area)} real_cells={real}")

def bucket(want, floor=8, steps=(2, 3)):
    want = max(int(want), int(floor), 1)
    c = 1
    while True:
        for m in steps:
            if m * c >= want:
                return m * c
        c <<= 1

def evaluate(cells, headroom_num=13, headroom_den=10, add=1, steps=(2,3),
             floors=None):
    if floors is None:
        floors = [max(256 // k, 8) for k in cells]
    prev = 0
    S = 0
    stats = []
    for k, f in zip(cells, floors):
        m = int(((area > prev) & (area <= k)).sum())
        if k == cells[-1]:
            m += int((area > k).sum())
        cap = bucket(m * headroom_num // headroom_den + add, f, steps)
        S += k * cap
        stats.append((k, m, cap))
        prev = k
    return S, stats

LADDERS = {
  "current (r2)": (1, 2, 4, 8, 16, 32, 64, 256, 1024, 4096),
  "fine16": (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 128, 512, 2048, 4096),
  "fine20": (1, 2, 3, 4, 5, 6, 8, 10, 12, 16, 20, 24, 32, 48, 64, 96, 128,
             256, 1024, 4096),
  "fine24": (1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 20, 24, 28, 32, 40, 48,
             64, 96, 128, 256, 1024, 4096),
}
for name, cells in LADDERS.items():
    for hr, steps in ((13, (2, 3)), (11, (8,9,10,11,12,13,14,15))):
        S, stats = evaluate(cells, hr, 10, 1, steps)
        print(f"{name:14s} hr={hr/10:.1f} steps={len(steps)} S={S:>9d} "
              f"pad={S/real:.3f}x")
    if name == "current (r2)":
        S, stats = evaluate(cells)
        print("   tiers:", [(k, m, c) for k, m, c in stats])
