#!/usr/bin/env bash
# Environment setup — analog of the reference's setup.sh (exe caches, dirs,
# log levels; /root/reference/setup.sh:1-33), TPU-native.

set -u

REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"

# Persistent XLA compilation cache (POPLAR_EXECUTABLE_CACHE_DIR analog).
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$REPO_ROOT/.jax_cache}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

# Checkpoint + dataset locations for the demo.
export CHECKPOINT_DIR="${CHECKPOINT_DIR:-$REPO_ROOT/out-demo}"
export DATASET_DIR="${DATASET_DIR:-$REPO_ROOT/demo/data}"
mkdir -p "$CHECKPOINT_DIR" "$DATASET_DIR"

# Quiet logs (POPTORCH_LOG_LEVEL=ERR analog).
export TPU_STDERR_LOG_LEVEL="${TPU_STDERR_LOG_LEVEL:-3}"
export TF_CPP_MIN_LOG_LEVEL="${TF_CPP_MIN_LOG_LEVEL:-2}"

# Device discovery (gc-monitor analog).
export NUM_AVAILABLE_TPU="$(python -m flash_attention_tpu.utils.devices --count 2>/dev/null || echo 0)"

echo "flash-attention-tpu env ready: $NUM_AVAILABLE_TPU device(s), cache at $JAX_COMPILATION_CACHE_DIR"
