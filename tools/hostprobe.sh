#!/usr/bin/env bash
# Host-health probe for this shared-bandwidth VM: single-thread memcpy
# (the resource co-tenants steal — swings 0.3-4 GB/s between windows) and
# a compute-bound md5 probe (stays flat, so a low memcpy + flat md5 means
# bandwidth degradation, not CPU steal). Use before trusting any
# wall-clock benchmark: <1 GB/s = degraded, 1-2 GB/s = medium,
# >2.5 GB/s = healthy (see BASELINE.md "Host-speed variance disclosure").
python3 - <<'EOF'
import hashlib, time

buf = bytearray(64 * 1024 * 1024)
t0 = time.time()
for _ in range(20):
    bytes(buf)
memcpy = 20 * 64 / 1024 / (time.time() - t0)

h = hashlib.md5()
data = b"x" * 1048576
t0 = time.time()
for _ in range(400):
    h.update(data)
md5 = 400 / (time.time() - t0)

state = "degraded" if memcpy < 1.0 else ("medium" if memcpy < 2.5 else "healthy")
print(f"memcpy {memcpy:.2f} GB/s | md5 {md5:.0f} MB/s | window: {state}")
EOF
