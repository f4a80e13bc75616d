#!/bin/bash
# Poll the axon relay; when it answers, run the queued TPU measurements.
#
# The axon relay (127.0.0.1:8083) can die mid-session and stay down for
# hours (first observed 2026-08-17 ~20:00); nothing in this container can
# restart it. Arm this watcher detached so the pending re-measurements
# land automatically the moment the tunnel answers:
#
#   nohup scripts/when_tpu_back.sh >/tmp/when_tpu_back.nohup 2>&1 &
#
# Progress lands in /tmp/tpu_back.log; measurement outputs in
# /tmp/ab_mc_packed.out, /tmp/tpu_tests.out, /tmp/bench_final.out.
# Stop it with `kill $(cat /tmp/when_tpu_back.pid)` (NEVER pkill -f).
#
# Queue history: round-4 first arming ran ab_fusej -> profile_banded ->
# bench_configs -> bench (all landed 2026-08-18); second arming ran the
# packed-mc A/B + suite + bench (landed 2026-08-19 09:0x-10:5x, by hand
# after a reboot ate the watcher); third arming ran the pyramid A/B +
# suite + bench (landed 2026-08-19 22:xx-23:5x). Current queue (armed
# 2026-08-20, relay half-dead again: HTTP answers 404 but device init
# hangs >300 s) = the tpu-marked suite (picks up whatever new tpu tests
# are in the working tree, e.g. the morph family) -> a bench.py
# confirmation near the round close. Fourth arming (2026-08-20, relay
# dead again): bench_morph kernel-vs-jnp A/B (the banded morph kernel's
# first on-chip numbers) -> tpu suite (incl. test_pallas_morph compiled
# tests) -> bench.
#
# Probe = real jax device init in a timed subprocess, NOT an HTTP GET:
# after the 2026-08-18 box reboot the relay LISTENED on 8083 but never
# answered HTTP (curl -m 5 -> rc 28) while jax.devices() initialized the
# chip fine in ~10 s — a curl probe would have sat on a working TPU
# forever. The converse failure (dead relay) makes jax.devices() HANG,
# which the `timeout` turns into a clean retry.
export PYTHONPATH=/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/when_tpu_back.pid
for i in $(seq 1 2000); do
  if timeout 300 python -c 'import jax; assert jax.default_backend() == "tpu"' \
       >/dev/null 2>&1; then
    echo "tunnel back at $(date)" > /tmp/tpu_back.log
    sleep 30
    cd /root/repo
    timeout 3600 python scripts/bench_morph.py > /tmp/bench_morph.out 2>&1
    echo "bench_morph exit=$?" >> /tmp/tpu_back.log
    cp -f /tmp/bench_morph.out \
          /root/repo/artifacts/bench_morph_kernel.out 2>/dev/null
    timeout 5400 env RUN_TPU_TESTS=1 python -m pytest tests/ -m tpu -q \
        > /tmp/tpu_tests.out 2>&1
    echo "tpu_tests exit=$?" >> /tmp/tpu_back.log
    timeout 1800 python bench.py > /tmp/bench_final.out 2>&1
    echo "bench exit=$?" >> /tmp/tpu_back.log
    # mirror the raw outputs into the repo so the end-of-round
    # auto-commit preserves them even if nobody analyzes them in time
    mkdir -p /root/repo/artifacts
    cp -f /tmp/tpu_tests.out /tmp/bench_final.out \
          /tmp/tpu_back.log /root/repo/artifacts/ 2>/dev/null
    echo "ALL DONE $(date)" >> /tmp/tpu_back.log
    cp -f /tmp/tpu_back.log /root/repo/artifacts/ 2>/dev/null
    exit 0
  fi
  sleep 60
done
echo "gave up $(date)" > /tmp/tpu_back.log
