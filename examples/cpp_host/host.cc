// Minimal standalone C++ host for exported acids_transforms_tpu chains.
//
// The reference's raison d'être is TorchScript-in-C++ for realtime use
// (reference README.md:58-59).  The TPU-native equivalent: a fitted chain is
// exported to StableHLO (export_artifact.py -> melspec.stablehlo.mlir), and
// this host — no Python anywhere at runtime — parses the module, compiles it
// with the XLA local CPU client and executes it on raw float32 audio.
//
// Links against the XLA runtime shipped inside the tensorflow wheel
// (libtensorflow_cc.so.2 exports the full xla:: C++ surface).  The PJRT C++
// headers need LLVM headers the wheel does not ship, so the classic
// LocalClient API is used; the StableHLO parser is reached through its
// exported symbol (forward-declared below) without dragging in MLIR headers.
//
// Build + run:  make && make artifact && make run   (see Makefile;
// exercised end to end by tests/test_cpp_host.py).
//
// Usage: host <artifact_dir>
//   artifact_dir/melspec.stablehlo.mlir  StableHLO module (text)
//   artifact_dir/input.bin               float32 raw input
//   artifact_dir/input_shape.txt         whitespace-separated dims
//   artifact_dir/expected.bin            float32 raw expected output
// Prints the output element count and max |out - expected|; exit 0 iff
// < 1e-4.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <memory>
#include <sstream>
#include <string>
#include <string_view>
#include <vector>

#include "absl/status/status.h"
#include "xla/client/client_library.h"
#include "xla/client/local_client.h"
#include "xla/hlo/builder/xla_computation.h"
#include "xla/literal.h"
#include "xla/shape_util.h"
#include "xla/stream_executor/platform_manager.h"

namespace xla {
// Exported by libtensorflow_cc (declared in xla/pjrt/mlir_to_hlo.h, whose
// MLIR includes the wheel does not ship — declare the symbol directly).
absl::Status ParseMlirModuleStringAndConvertToXlaComputation(
    std::string_view mlir_module_str, XlaComputation& xla_computation,
    bool use_tuple_args, bool return_tuple);
}  // namespace xla

namespace {

std::string ReadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path.c_str());
    std::exit(2);
  }
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

std::vector<int64_t> ReadShape(const std::string& path) {
  std::istringstream ss(ReadFile(path));
  std::vector<int64_t> dims;
  int64_t d;
  while (ss >> d) dims.push_back(d);
  return dims;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 2) {
    std::fprintf(stderr, "usage: %s <artifact_dir>\n", argv[0]);
    return 2;
  }
  const std::string dir = argv[1];

  const std::string mlir = ReadFile(dir + "/melspec.stablehlo.mlir");
  const std::string input_raw = ReadFile(dir + "/input.bin");
  const std::string expected_raw = ReadFile(dir + "/expected.bin");
  const std::vector<int64_t> in_dims = ReadShape(dir + "/input_shape.txt");

  // --- StableHLO -> XlaComputation
  xla::XlaComputation computation;
  absl::Status st = xla::ParseMlirModuleStringAndConvertToXlaComputation(
      mlir, computation, /*use_tuple_args=*/false, /*return_tuple=*/false);
  if (!st.ok()) {
    std::fprintf(stderr, "parse: %s\n", st.ToString().c_str());
    return 2;
  }

  // --- local CPU client ("Host" platform), compile
  auto platform_or = stream_executor::PlatformManager::PlatformWithName("Host");
  if (!platform_or.ok()) {
    std::fprintf(stderr, "platform: %s\n",
                 platform_or.status().ToString().c_str());
    return 2;
  }
  xla::LocalClientOptions copts_client(platform_or.value());
  auto client_or = xla::ClientLibrary::GetOrCreateLocalClient(copts_client);
  if (!client_or.ok()) {
    std::fprintf(stderr, "client: %s\n", client_or.status().ToString().c_str());
    return 2;
  }
  xla::LocalClient* client = client_or.value();
  const xla::Shape arg_shape =
      xla::ShapeUtil::MakeShape(xla::PrimitiveType::F32, in_dims);
  std::vector<const xla::Shape*> arg_shapes = {&arg_shape};
  auto exes_or =
      client->Compile(computation, arg_shapes, xla::ExecutableBuildOptions());
  if (!exes_or.ok()) {
    std::fprintf(stderr, "compile: %s\n", exes_or.status().ToString().c_str());
    return 2;
  }
  auto exes = std::move(exes_or).value();

  // --- input literal -> device buffer
  xla::Literal in_lit(arg_shape);
  if (in_lit.size_bytes() != input_raw.size()) {
    std::fprintf(stderr, "input size mismatch (%zu vs %zu bytes)\n",
                 (size_t)in_lit.size_bytes(), input_raw.size());
    return 2;
  }
  std::memcpy(in_lit.untyped_data(), input_raw.data(), input_raw.size());
  auto in_buf_or = client->LiteralToShapedBuffer(
      in_lit, client->default_device_ordinal());
  if (!in_buf_or.ok()) {
    std::fprintf(stderr, "transfer: %s\n",
                 in_buf_or.status().ToString().c_str());
    return 2;
  }
  auto in_buf = std::move(in_buf_or).value();

  // --- execute
  xla::ExecutableRunOptions run_options;
  run_options.set_allocator(client->backend().memory_allocator());
  run_options.set_intra_op_thread_pool(
      client->backend().eigen_intra_op_thread_pool_device());
  auto out_or = exes[0]->Run({&in_buf}, run_options);
  if (!out_or.ok()) {
    std::fprintf(stderr, "execute: %s\n", out_or.status().ToString().c_str());
    return 2;
  }
  auto lit_or = client->ShapedBufferToLiteral(out_or.value());
  if (!lit_or.ok()) {
    std::fprintf(stderr, "fetch: %s\n", lit_or.status().ToString().c_str());
    return 2;
  }
  xla::Literal out_lit = std::move(lit_or).value();
  if (out_lit.shape().IsTuple()) {
    out_lit = out_lit.DecomposeTuple()[0].Clone();
  }

  // --- compare against the Python-produced expectation
  const float* out = static_cast<const float*>(out_lit.untyped_data());
  const size_t n = out_lit.size_bytes() / sizeof(float);
  const float* want = reinterpret_cast<const float*>(expected_raw.data());
  const size_t n_want = expected_raw.size() / sizeof(float);

  std::printf("output elements: %zu (expected %zu)\n", n, n_want);
  if (n != n_want) {
    std::fprintf(stderr, "shape mismatch\n");
    return 1;
  }
  float max_diff = 0.0f;
  for (size_t i = 0; i < n; ++i) {
    float d = out[i] - want[i];
    if (d < 0) d = -d;
    if (d > max_diff) max_diff = d;
  }
  std::printf("max |out - expected| = %g\n", max_diff);
  return max_diff < 1e-4f ? 0 : 1;
}
