#!/usr/bin/env bash
# Pre-commit compile gate. Run before EVERY commit.
#
# Three end-of-round snapshots (r6, r7, r9) failed to compile, and each one
# zeroed that round's driver certification: Verify never runs, so
# CORRECTNESS_r{N}.json is {} and every operator reads "untested" no matter
# how good the code is. The cheapest insurance is to never commit anything
# that hasn't passed BOTH compile configs — main sources (Verify/Bench/
# DumpPlans mains) and test sources (the spec suite).
#
# Usage: tools/gate.sh   (exits non-zero if either config fails)
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch compile Test/compile
echo "[gate] compile + Test/compile green — safe to commit"
