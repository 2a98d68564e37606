# Native runtime build.
#
# Analog of the reference Makefile (/root/reference/Makefile:4-33), which
# compiles the Poplar custom-op .so; here the TPU compute path is Pallas, so
# the native library is the host-side data-loading runtime.

CXX ?= g++
CXXFLAGS ?= -O3 -std=c++17 -Wall -Wextra -Werror -fPIC
OUT ?= build
OBJDIR ?= $(OUT)/obj

LIB = $(OUT)/libfat_dataloader.so
SRCS = csrc/dataloader.cpp
OBJS = $(SRCS:csrc/%.cpp=$(OBJDIR)/%.o)

all: $(LIB)

$(OBJDIR)/%.o: csrc/%.cpp
	@mkdir -p $(OBJDIR)
	$(CXX) $(CXXFLAGS) -c $< -o $@

$(LIB): $(OBJS)
	@mkdir -p $(OUT)
	$(CXX) $(CXXFLAGS) -shared -Wl,--no-undefined $^ -o $@

clean:
	rm -rf $(OUT)

# ~2 min on-hardware smoke: one fwd/bwd parity, GQA, quant-KV, paged decode.
# Interpret mode cannot catch Mosaic compile/tiling failures (commit
# f1c3b7f) — run this before claiming any kernel change works, and the
# full matrix (`make tpu-test`) before BASELINE.md table updates.
tpu-smoke:
	FA_TPU_TESTS=1 timeout 600 python -m pytest tests/tpu -q \
		-k "(test_fwd_bwd_parity and bfloat16) or test_gqa_fwd_bwd or (test_quant_kv and int8) or test_paged_decode_attention"

tpu-test:
	FA_TPU_TESTS=1 timeout 1800 python -m pytest tests/tpu -q

.PHONY: all clean tpu-smoke tpu-test
