// PJRT C API consumer for a yolo_tpu StableHLO export.
//
// Native (C++) counterpart of consumer.py: loads a PJRT plugin with dlopen,
// compiles the exported StableHLO module (weights baked in — one uint8 NHWC
// image argument), runs a frame on the plugin's device (the real TPU through
// /opt/axon/libaxon_pjrt.so in this environment; any PJRT plugin elsewhere)
// and writes the raw f32 prediction tensor for parity checking.
//
// This replaces the reference's per-engine C++ deployment examples
// (ref: examples/YOLOv8-ONNXRuntime-CPP/inference.cpp:1-377,
// examples/YOLOv8-CPP-Inference/inference.cpp:1-197) with the one interface a
// TPU deployment actually has: the PJRT C API over an exported XLA program.
//
// Usage:
//   pjrt_consumer MODULE.mlir [--plugin libfoo.so] [--opt k=v ...]
//                 [--input frame.u8] [--out preds.f32] [--no-default-opts]
//
// The module comes from:  yolo export format=stablehlo  (writes both the
// jax.export envelope .stablehlo and the raw single-platform .mlir).

#include <dlfcn.h>

#include <cinttypes>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <random>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

const PJRT_Api* g_api = nullptr;

[[noreturn]] void Die(const std::string& msg) {
  std::fprintf(stderr, "pjrt_consumer: %s\n", msg.c_str());
  std::exit(1);
}

void Check(PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args m{};
  m.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  m.error = err;
  g_api->PJRT_Error_Message(&m);
  std::string text(m.message, m.message_size);
  PJRT_Error_Destroy_Args d{};
  d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  d.error = err;
  g_api->PJRT_Error_Destroy(&d);
  Die(std::string(what) + ": " + text);
}

void Await(PJRT_Event* event, const char* what) {
  PJRT_Event_Await_Args a{};
  a.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  a.event = event;
  Check(g_api->PJRT_Event_Await(&a), what);
  PJRT_Event_Destroy_Args d{};
  d.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  d.event = event;
  g_api->PJRT_Event_Destroy(&d);
}

std::string ReadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) Die("cannot open " + path);
  return std::string(std::istreambuf_iterator<char>(f), {});
}

// ---- protobuf wire helpers (no protobuf dependency) -----------------------
// CompileOptionsProto {  executable_build_options = 3 (message); }
// ExecutableBuildOptionsProto { device_ordinal = 1; num_replicas = 4;
//                               num_partitions = 5; }  (all varint)
// Field numbers confirmed against xla/pjrt/proto/compile_options.pb.h
// (kExecutableBuildOptionsFieldNumber etc.).
std::string Varint(uint64_t v) {
  std::string out;
  while (v >= 0x80) {
    out.push_back(static_cast<char>((v & 0x7f) | 0x80));
    v >>= 7;
  }
  out.push_back(static_cast<char>(v));
  return out;
}

std::string MakeCompileOptionsProto() {
  std::string ebo;
  ebo += static_cast<char>(0x08);  // field 1 (device_ordinal), varint
  ebo += Varint(static_cast<uint64_t>(int64_t{-1}));
  ebo += static_cast<char>(0x20);  // field 4 (num_replicas), varint
  ebo += Varint(1);
  ebo += static_cast<char>(0x28);  // field 5 (num_partitions), varint
  ebo += Varint(1);
  std::string out;
  out += static_cast<char>(0x1a);  // field 3 (executable_build_options), bytes
  out += Varint(ebo.size());
  out += ebo;
  return out;
}

// ---- client create options ------------------------------------------------
struct Opt {
  std::string key;
  std::string sval;
  int64_t ival = 0;
  bool is_int = false;
};

PJRT_NamedValue ToNamed(const Opt& o) {
  PJRT_NamedValue nv{};
  nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
  nv.name = o.key.c_str();
  nv.name_size = o.key.size();
  if (o.is_int) {
    nv.type = PJRT_NamedValue_kInt64;
    nv.int64_value = o.ival;
    nv.value_size = 1;
  } else {
    nv.type = PJRT_NamedValue_kString;
    nv.string_value = o.sval.c_str();
    nv.value_size = o.sval.size();
  }
  return nv;
}

std::string RandomSessionId() {
  std::random_device rd;
  char buf[64];
  std::snprintf(buf, sizeof(buf), "pjrt-consumer-%08x%08x", rd(), rd());
  return buf;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr,
                 "usage: %s MODULE.mlir [--plugin PATH] [--opt k=v ...] "
                 "[--input frame.u8] [--out preds.f32] [--no-default-opts]\n",
                 argv[0]);
    return 2;
  }
  std::string module_path = argv[1];
  const char* env_plugin = std::getenv("PJRT_PLUGIN");
  std::string plugin_path = env_plugin ? env_plugin : "/opt/axon/libaxon_pjrt.so";
  std::string input_path, out_path = "preds.f32";
  bool default_opts = true;
  std::vector<Opt> user_opts;
  for (int i = 2; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) Die("missing value after " + a);
      return argv[++i];
    };
    if (a == "--plugin") {
      plugin_path = next();
    } else if (a == "--input") {
      input_path = next();
    } else if (a == "--out") {
      out_path = next();
    } else if (a == "--no-default-opts") {
      default_opts = false;
    } else if (a == "--opt") {
      std::string kv = next();
      auto eq = kv.find('=');
      if (eq == std::string::npos) Die("--opt expects k=v, got " + kv);
      Opt o;
      o.key = kv.substr(0, eq);
      std::string v = kv.substr(eq + 1);
      char* end = nullptr;
      long long iv = std::strtoll(v.c_str(), &end, 10);
      if (end && *end == '\0' && !v.empty()) {
        o.is_int = true;
        o.ival = iv;
      } else {
        o.sval = v;
      }
      user_opts.push_back(o);
    } else {
      Die("unknown arg " + a);
    }
  }

  // ---- load plugin --------------------------------------------------------
  void* handle = dlopen(plugin_path.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (!handle) Die(std::string("dlopen failed: ") + dlerror());
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetPjrtApiFn>(dlsym(handle, "GetPjrtApi"));
  if (!get_api) Die("plugin has no GetPjrtApi symbol");
  g_api = get_api();
  std::fprintf(stderr, "plugin: %s (PJRT C API v%d.%d)\n", plugin_path.c_str(),
               g_api->pjrt_api_version.major_version,
               g_api->pjrt_api_version.minor_version);

  PJRT_Plugin_Initialize_Args init{};
  init.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  Check(g_api->PJRT_Plugin_Initialize(&init), "Plugin_Initialize");

  // ---- create client ------------------------------------------------------
  // Defaults mirror what the axon JAX registration passes for pool mode
  // (remote compile through the relay); --no-default-opts for stock plugins.
  std::vector<Opt> opts;
  if (default_opts) {
    const char* gen = std::getenv("PALLAS_AXON_TPU_GEN");
    std::string topo = std::string(gen ? gen : "v5e") + ":1x1x1";
    opts.push_back({"remote_compile", "", 1, true});
    opts.push_back({"local_only", "", 0, true});
    opts.push_back({"priority", "", 0, true});
    opts.push_back({"topology", topo, 0, false});
    opts.push_back({"n_slices", "", 1, true});
    opts.push_back({"session_id", RandomSessionId(), 0, false});
    opts.push_back({"rank", "", static_cast<int64_t>(0xFFFFFFFFll), true});
  }
  for (const auto& o : user_opts) {
    bool replaced = false;
    for (auto& d : opts) {
      if (d.key == o.key) {
        d = o;
        replaced = true;
      }
    }
    if (!replaced) opts.push_back(o);
  }
  std::vector<PJRT_NamedValue> named;
  named.reserve(opts.size());
  for (const auto& o : opts) named.push_back(ToNamed(o));

  PJRT_Client_Create_Args cc{};
  cc.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cc.create_options = named.data();
  cc.num_options = named.size();
  Check(g_api->PJRT_Client_Create(&cc), "Client_Create");
  PJRT_Client* client = cc.client;

  PJRT_Client_PlatformName_Args pn{};
  pn.struct_size = PJRT_Client_PlatformName_Args_STRUCT_SIZE;
  pn.client = client;
  Check(g_api->PJRT_Client_PlatformName(&pn), "PlatformName");
  std::fprintf(stderr, "platform: %.*s\n", static_cast<int>(pn.platform_name_size),
               pn.platform_name);

  PJRT_Client_AddressableDevices_Args ad{};
  ad.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  ad.client = client;
  Check(g_api->PJRT_Client_AddressableDevices(&ad), "AddressableDevices");
  if (ad.num_addressable_devices == 0) Die("no addressable devices");
  PJRT_Device* device = ad.addressable_devices[0];
  std::fprintf(stderr, "devices: %zu\n", ad.num_addressable_devices);

  // ---- compile ------------------------------------------------------------
  std::string code = ReadFile(module_path);
  std::string copts = MakeCompileOptionsProto();
  PJRT_Program program{};
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = code.data();
  program.code_size = code.size();
  static const char kFormat[] = "mlir";
  program.format = kFormat;
  program.format_size = sizeof(kFormat) - 1;

  PJRT_Client_Compile_Args comp{};
  comp.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  comp.client = client;
  comp.program = &program;
  comp.compile_options = copts.data();
  comp.compile_options_size = copts.size();
  std::fprintf(stderr, "compiling %s (%.1f MB)...\n", module_path.c_str(),
               code.size() / 1e6);
  Check(g_api->PJRT_Client_Compile(&comp), "Compile");
  PJRT_LoadedExecutable* exe = comp.executable;
  std::fprintf(stderr, "compiled.\n");

  PJRT_LoadedExecutable_GetExecutable_Args ge{};
  ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  ge.loaded_executable = exe;
  Check(g_api->PJRT_LoadedExecutable_GetExecutable(&ge), "GetExecutable");
  PJRT_Executable_NumOutputs_Args no{};
  no.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  no.executable = ge.executable;
  Check(g_api->PJRT_Executable_NumOutputs(&no), "NumOutputs");
  size_t num_outputs = no.num_outputs;

  // ---- input frame: .u8 file sized to the module's input, or deterministic
  // synthetic pattern (matches check_parity.py) ----------------------------
  // The exported module takes one uint8 NHWC argument; geometry rides in the
  // sidecar .json written by the exporter (we accept explicit dims there).
  std::string meta_path = module_path + ".json";
  int64_t dims[4] = {1, 512, 640, 3};
  {
    std::ifstream mf(meta_path);
    if (mf) {
      std::string meta((std::istreambuf_iterator<char>(mf)), {});
      // tiny parse: "shape": [b, h, w, c]
      auto pos = meta.find("\"shape\"");
      if (pos != std::string::npos) {
        std::sscanf(meta.c_str() + pos,
                    "\"shape\": [%" SCNd64 ", %" SCNd64 ", %" SCNd64 ", %" SCNd64 "]",
                    &dims[0], &dims[1], &dims[2], &dims[3]);
      }
    }
  }
  size_t n_in = static_cast<size_t>(dims[0] * dims[1] * dims[2] * dims[3]);
  std::vector<uint8_t> frame(n_in);
  if (!input_path.empty()) {
    std::string raw = ReadFile(input_path);
    if (raw.size() != n_in)
      Die("input size mismatch: got " + std::to_string(raw.size()) + ", want " +
          std::to_string(n_in));
    std::memcpy(frame.data(), raw.data(), n_in);
  } else {
    for (size_t i = 0; i < n_in; ++i) frame[i] = static_cast<uint8_t>((i * 31 + 7) % 251);
  }

  PJRT_Client_BufferFromHostBuffer_Args hb{};
  hb.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  hb.client = client;
  hb.data = frame.data();
  hb.type = PJRT_Buffer_Type_U8;
  hb.dims = dims;
  hb.num_dims = 4;
  hb.host_buffer_semantics = PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  hb.device = device;
  Check(g_api->PJRT_Client_BufferFromHostBuffer(&hb), "BufferFromHostBuffer");
  Await(hb.done_with_host_buffer, "upload");
  PJRT_Buffer* in_buf = hb.buffer;

  // ---- execute ------------------------------------------------------------
  PJRT_ExecuteOptions eopts{};
  eopts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
  PJRT_Buffer* arg_list[1] = {in_buf};
  PJRT_Buffer* const* arg_lists[1] = {arg_list};
  std::vector<PJRT_Buffer*> out_list(num_outputs, nullptr);
  PJRT_Buffer** out_lists[1] = {out_list.data()};
  PJRT_Event* done[1] = {nullptr};

  PJRT_LoadedExecutable_Execute_Args ex{};
  ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  ex.executable = exe;
  ex.options = &eopts;
  ex.argument_lists = arg_lists;
  ex.num_devices = 1;
  ex.num_args = 1;
  ex.output_lists = out_lists;
  ex.device_complete_events = done;
  Check(g_api->PJRT_LoadedExecutable_Execute(&ex), "Execute");
  Await(done[0], "execute");

  // ---- download outputs ---------------------------------------------------
  std::ofstream out(out_path, std::ios::binary);
  for (size_t oi = 0; oi < num_outputs; ++oi) {
    PJRT_Buffer_Dimensions_Args bd{};
    bd.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
    bd.buffer = out_list[oi];
    Check(g_api->PJRT_Buffer_Dimensions(&bd), "Buffer_Dimensions");
    std::string shape;
    for (size_t d = 0; d < bd.num_dims; ++d)
      shape += (d ? "x" : "") + std::to_string(bd.dims[d]);

    PJRT_Buffer_ToHostBuffer_Args th{};
    th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    th.src = out_list[oi];
    Check(g_api->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer(size)");
    std::vector<char> host(th.dst_size);
    th.dst = host.data();
    Check(g_api->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer");
    Await(th.event, "download");

    out.write(host.data(), static_cast<std::streamsize>(host.size()));
    // summary for the human: interpret as f32 (the export's output dtype)
    const float* f = reinterpret_cast<const float*>(host.data());
    size_t n = host.size() / sizeof(float);
    double mx = -1e30, sum = 0;
    for (size_t i = 0; i < n; ++i) {
      mx = f[i] > mx ? f[i] : mx;
      sum += f[i];
    }
    std::fprintf(stderr, "output[%zu]: %s f32, max %.6f, mean %.6f\n", oi,
                 shape.c_str(), mx, n ? sum / n : 0.0);
  }
  std::fprintf(stderr, "wrote %s\n", out_path.c_str());
  std::printf("OK\n");

  // teardown (process exit releases the claim; be tidy anyway)
  PJRT_Client_Destroy_Args cd{};
  cd.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
  cd.client = client;
  g_api->PJRT_Client_Destroy(&cd);
  return 0;
}
