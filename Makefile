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

.PHONY: all clean
