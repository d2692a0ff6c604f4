// PJRT detector session + native postprocessing. See detector.h.

#include "detector.h"

#include <dlfcn.h>

#include <algorithm>
#include <cinttypes>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <random>
#include <stdexcept>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace yolo_tpu {

// ---- postprocessing ---------------------------------------------------------

LetterboxInfo LetterboxU8(const uint8_t* src, int h, int w, uint8_t* dst,
                          int dh, int dw, uint8_t pad_value) {
  constexpr int c = 3;
  const float r = std::min(static_cast<float>(dh) / h, static_cast<float>(dw) / w);
  const int rw = static_cast<int>(std::lround(w * r));
  const int rh = static_cast<int>(std::lround(h * r));
  const float dx = (dw - rw) / 2.0f;
  const float dy = (dh - rh) / 2.0f;
  const int left = static_cast<int>(std::lround(dx - 0.1f));
  const int top = static_cast<int>(std::lround(dy - 0.1f));

  std::memset(dst, pad_value, static_cast<size_t>(dh) * dw * c);

  const float sx = static_cast<float>(w) / rw;
  const float sy = static_cast<float>(h) / rh;
  for (int y = 0; y < rh; ++y) {
    const float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    const float wy = fy - y0;
    int y1 = y0 + 1;
    y0 = std::min(std::max(y0, 0), h - 1);
    y1 = std::min(std::max(y1, 0), h - 1);
    uint8_t* drow = dst + (static_cast<size_t>(y + top) * dw + left) * c;
    const uint8_t* s0 = src + static_cast<size_t>(y0) * w * c;
    const uint8_t* s1 = src + static_cast<size_t>(y1) * w * c;
    for (int x = 0; x < rw; ++x) {
      const float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(std::floor(fx));
      const float wx = fx - x0;
      int x1 = x0 + 1;
      x0 = std::min(std::max(x0, 0), w - 1);
      x1 = std::min(std::max(x1, 0), w - 1);
      for (int k = 0; k < c; ++k) {
        const float v =
            (1 - wy) * ((1 - wx) * s0[x0 * c + k] + wx * s0[x1 * c + k]) +
            wy * ((1 - wx) * s1[x0 * c + k] + wx * s1[x1 * c + k]);
        drow[x * c + k] =
            static_cast<uint8_t>(std::lround(std::min(std::max(v, 0.0f), 255.0f)));
      }
    }
  }
  return {r, dx, dy};
}

void ScaleBoxes(std::vector<Detection>* dets, const LetterboxInfo& lb,
                int src_h, int src_w) {
  for (auto& d : *dets) {
    d.bbox[0] = std::min(std::max((d.bbox[0] - lb.dx) / lb.ratio, 0.0), double(src_w));
    d.bbox[1] = std::min(std::max((d.bbox[1] - lb.dy) / lb.ratio, 0.0), double(src_h));
    d.bbox[2] = std::min(std::max((d.bbox[2] - lb.dx) / lb.ratio, 0.0), double(src_w));
    d.bbox[3] = std::min(std::max((d.bbox[3] - lb.dy) / lb.ratio, 0.0), double(src_h));
  }
}

std::vector<Detection> NmsGreedy(std::vector<Detection> dets,
                                 double iou_threshold, int max_det) {
  std::stable_sort(dets.begin(), dets.end(),
                   [](const Detection& a, const Detection& b) { return a.conf > b.conf; });
  std::vector<Detection> kept;
  std::vector<bool> suppressed(dets.size(), false);
  for (size_t i = 0; i < dets.size() && static_cast<int>(kept.size()) < max_det; ++i) {
    if (suppressed[i]) continue;
    kept.push_back(dets[i]);
    for (size_t j = i + 1; j < dets.size(); ++j) {
      if (!suppressed[j] && IoUXYXY(dets[i].bbox, dets[j].bbox) > iou_threshold)
        suppressed[j] = true;
    }
  }
  return kept;
}

std::vector<Detection> DecodeRawPredictions(const float* preds, int channels,
                                            int anchors, double conf_threshold) {
  // layout (channels, anchors): rows 0-3 = cx,cy,w,h (network px), 4.. = class
  // probabilities (already sigmoided by the head).
  const int nc = channels - 4;
  std::vector<Detection> out;
  for (int a = 0; a < anchors; ++a) {
    float best = 0.0f;
    for (int k = 0; k < nc; ++k)
      best = std::max(best, preds[static_cast<size_t>(4 + k) * anchors + a]);
    if (best <= conf_threshold) continue;
    const double cx = preds[0 * static_cast<size_t>(anchors) + a];
    const double cy = preds[1 * static_cast<size_t>(anchors) + a];
    const double w = preds[2 * static_cast<size_t>(anchors) + a];
    const double h = preds[3 * static_cast<size_t>(anchors) + a];
    out.push_back({{cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2}, best});
  }
  return out;
}

// ---- PJRT session -----------------------------------------------------------

namespace {

std::string ReadFileOrThrow(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot open " + path);
  return std::string(std::istreambuf_iterator<char>(f), {});
}

std::string Varint(uint64_t v) {
  std::string out;
  while (v >= 0x80) {
    out.push_back(static_cast<char>((v & 0x7f) | 0x80));
    v >>= 7;
  }
  out.push_back(static_cast<char>(v));
  return out;
}

// Minimal CompileOptionsProto (see pjrt_consumer.cpp for field-number notes).
std::string MakeCompileOptionsProto() {
  std::string ebo;
  ebo += static_cast<char>(0x08);
  ebo += Varint(static_cast<uint64_t>(int64_t{-1}));
  ebo += static_cast<char>(0x20);
  ebo += Varint(1);
  ebo += static_cast<char>(0x28);
  ebo += Varint(1);
  std::string out;
  out += static_cast<char>(0x1a);
  out += Varint(ebo.size());
  out += ebo;
  return out;
}

}  // namespace

struct PjrtDetector::Impl {
  const PJRT_Api* api = nullptr;
  void* dl_handle = nullptr;
  PJRT_Client* client = nullptr;
  PJRT_Device* device = nullptr;
  PJRT_LoadedExecutable* exe = nullptr;
  size_t num_outputs = 0;
  int64_t in_dims[4] = {1, 640, 640, 3};

  // options storage must outlive Client_Create
  std::vector<std::string> opt_keys, opt_svals;

  void Check(PJRT_Error* err, const char* what) {
    if (err == nullptr) return;
    PJRT_Error_Message_Args m{};
    m.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
    m.error = err;
    api->PJRT_Error_Message(&m);
    std::string text(m.message, m.message_size);
    PJRT_Error_Destroy_Args d{};
    d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
    d.error = err;
    api->PJRT_Error_Destroy(&d);
    throw std::runtime_error(std::string(what) + ": " + text);
  }

  void Await(PJRT_Event* event, const char* what) {
    PJRT_Event_Await_Args a{};
    a.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    a.event = event;
    Check(api->PJRT_Event_Await(&a), what);
    PJRT_Event_Destroy_Args d{};
    d.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
    d.event = event;
    api->PJRT_Event_Destroy(&d);
  }

  std::vector<std::vector<char>> Execute(const uint8_t* frame,
                                         std::vector<std::vector<int64_t>>* out_dims,
                                         std::vector<PJRT_Buffer_Type>* out_types) {
    PJRT_Client_BufferFromHostBuffer_Args hb{};
    hb.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    hb.client = client;
    hb.data = frame;
    hb.type = PJRT_Buffer_Type_U8;
    hb.dims = in_dims;
    hb.num_dims = 4;
    hb.host_buffer_semantics = PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    hb.device = device;
    Check(api->PJRT_Client_BufferFromHostBuffer(&hb), "BufferFromHostBuffer");
    Await(hb.done_with_host_buffer, "upload");
    PJRT_Buffer* in_buf = hb.buffer;

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
    Check(api->PJRT_LoadedExecutable_Execute(&ex), "Execute");
    Await(done[0], "execute");

    std::vector<std::vector<char>> host_outs;
    for (size_t oi = 0; oi < num_outputs; ++oi) {
      PJRT_Buffer_Dimensions_Args bd{};
      bd.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
      bd.buffer = out_list[oi];
      Check(api->PJRT_Buffer_Dimensions(&bd), "Buffer_Dimensions");
      out_dims->emplace_back(bd.dims, bd.dims + bd.num_dims);

      PJRT_Buffer_ElementType_Args et{};
      et.struct_size = PJRT_Buffer_ElementType_Args_STRUCT_SIZE;
      et.buffer = out_list[oi];
      Check(api->PJRT_Buffer_ElementType(&et), "Buffer_ElementType");
      out_types->push_back(et.type);

      PJRT_Buffer_ToHostBuffer_Args th{};
      th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
      th.src = out_list[oi];
      Check(api->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer(size)");
      std::vector<char> host(th.dst_size);
      th.dst = host.data();
      Check(api->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer");
      Await(th.event, "download");
      host_outs.push_back(std::move(host));

      PJRT_Buffer_Destroy_Args bdst{};
      bdst.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
      bdst.buffer = out_list[oi];
      api->PJRT_Buffer_Destroy(&bdst);
    }
    PJRT_Buffer_Destroy_Args idst{};
    idst.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    idst.buffer = in_buf;
    api->PJRT_Buffer_Destroy(&idst);
    return host_outs;
  }
};

PjrtDetector::PjrtDetector(const std::string& plugin_path,
                           const std::string& module_path, bool default_opts)
    : impl_(new Impl) {
  Impl& im = *impl_;
  im.dl_handle = dlopen(plugin_path.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (!im.dl_handle)
    throw std::runtime_error(std::string("dlopen failed: ") + dlerror());
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api =
      reinterpret_cast<GetPjrtApiFn>(dlsym(im.dl_handle, "GetPjrtApi"));
  if (!get_api) throw std::runtime_error("plugin has no GetPjrtApi symbol");
  im.api = get_api();

  PJRT_Plugin_Initialize_Args init{};
  init.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  im.Check(im.api->PJRT_Plugin_Initialize(&init), "Plugin_Initialize");

  // client options (axon-TPU defaults mirror pjrt_consumer.cpp)
  // NamedValues hold raw pointers into opt_keys/opt_svals — reserve so
  // push_back never reallocates under them.
  im.opt_keys.reserve(16);
  im.opt_svals.reserve(16);
  std::vector<PJRT_NamedValue> named;
  auto add_int = [&](const std::string& k, int64_t v) {
    im.opt_keys.push_back(k);
    PJRT_NamedValue nv{};
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = im.opt_keys.back().c_str();
    nv.name_size = im.opt_keys.back().size();
    nv.type = PJRT_NamedValue_kInt64;
    nv.int64_value = v;
    nv.value_size = 1;
    named.push_back(nv);
  };
  auto add_str = [&](const std::string& k, const std::string& v) {
    im.opt_keys.push_back(k);
    im.opt_svals.push_back(v);
    PJRT_NamedValue nv{};
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = im.opt_keys.back().c_str();
    nv.name_size = im.opt_keys.back().size();
    nv.type = PJRT_NamedValue_kString;
    nv.string_value = im.opt_svals.back().c_str();
    nv.value_size = im.opt_svals.back().size();
    named.push_back(nv);
  };
  if (default_opts) {
    const char* gen = std::getenv("PALLAS_AXON_TPU_GEN");
    std::random_device rd;
    char sid[64];
    std::snprintf(sid, sizeof(sid), "cpp-detect-track-%08x%08x", rd(), rd());
    add_int("remote_compile", 1);
    add_int("local_only", 0);
    add_int("priority", 0);
    add_str("topology", std::string(gen ? gen : "v5e") + ":1x1x1");
    add_int("n_slices", 1);
    add_str("session_id", sid);
    add_int("rank", 0xFFFFFFFFll);
  }

  PJRT_Client_Create_Args cc{};
  cc.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cc.create_options = named.data();
  cc.num_options = named.size();
  im.Check(im.api->PJRT_Client_Create(&cc), "Client_Create");
  im.client = cc.client;

  PJRT_Client_AddressableDevices_Args ad{};
  ad.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  ad.client = im.client;
  im.Check(im.api->PJRT_Client_AddressableDevices(&ad), "AddressableDevices");
  if (ad.num_addressable_devices == 0) throw std::runtime_error("no devices");
  im.device = ad.addressable_devices[0];

  // geometry from the exporter's sidecar
  std::ifstream mf(module_path + ".json");
  if (mf) {
    std::string meta((std::istreambuf_iterator<char>(mf)), {});
    auto pos = meta.find("\"shape\"");
    if (pos != std::string::npos) {
      std::sscanf(meta.c_str() + pos,
                  "\"shape\": [%" SCNd64 ", %" SCNd64 ", %" SCNd64 ", %" SCNd64 "]",
                  &im.in_dims[0], &im.in_dims[1], &im.in_dims[2], &im.in_dims[3]);
    }
  }

  const std::string code = ReadFileOrThrow(module_path);
  const std::string copts = MakeCompileOptionsProto();
  PJRT_Program program{};
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = const_cast<char*>(code.data());
  program.code_size = code.size();
  static const char kFormat[] = "mlir";
  program.format = kFormat;
  program.format_size = sizeof(kFormat) - 1;

  PJRT_Client_Compile_Args comp{};
  comp.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  comp.client = im.client;
  comp.program = &program;
  comp.compile_options = copts.data();
  comp.compile_options_size = copts.size();
  std::fprintf(stderr, "compiling %s (%.1f MB)...\n", module_path.c_str(),
               code.size() / 1e6);
  im.Check(im.api->PJRT_Client_Compile(&comp), "Compile");
  im.exe = comp.executable;
  std::fprintf(stderr, "compiled.\n");

  PJRT_LoadedExecutable_GetExecutable_Args ge{};
  ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  ge.loaded_executable = im.exe;
  im.Check(im.api->PJRT_LoadedExecutable_GetExecutable(&ge), "GetExecutable");
  PJRT_Executable_NumOutputs_Args no{};
  no.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  no.executable = ge.executable;
  im.Check(im.api->PJRT_Executable_NumOutputs(&no), "NumOutputs");
  im.num_outputs = no.num_outputs;
}

PjrtDetector::~PjrtDetector() {
  if (!impl_) return;
  Impl& im = *impl_;
  if (im.client && im.api) {
    PJRT_Client_Destroy_Args cd{};
    cd.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
    cd.client = im.client;
    im.api->PJRT_Client_Destroy(&cd);
  }
  if (im.dl_handle) dlclose(im.dl_handle);
}

int PjrtDetector::input_h() const { return static_cast<int>(impl_->in_dims[1]); }
int PjrtDetector::input_w() const { return static_cast<int>(impl_->in_dims[2]); }

std::vector<Detection> PjrtDetector::Detect(const uint8_t* frame,
                                            double conf_threshold,
                                            double iou_threshold, int max_det) {
  std::vector<std::vector<int64_t>> dims;
  std::vector<PJRT_Buffer_Type> types;
  auto outs = impl_->Execute(frame, &dims, &types);

  if (outs.size() >= 4) {
    // nms=True export: boxes (1, max_det, 4) f32, scores, cls, valid.
    const auto& bd = dims[0];
    if (bd.size() != 3 || bd[2] != 4)
      throw std::runtime_error("unexpected fused-NMS boxes shape");
    const int n = static_cast<int>(bd[1]);
    const float* boxes = reinterpret_cast<const float*>(outs[0].data());
    const float* scores = reinterpret_cast<const float*>(outs[1].data());
    const char* valid = outs[3].data();  // bool, one byte per element
    std::vector<Detection> dets;
    for (int i = 0; i < n; ++i) {
      if (!valid[i]) continue;
      dets.push_back({{boxes[i * 4 + 0], boxes[i * 4 + 1], boxes[i * 4 + 2],
                       boxes[i * 4 + 3]},
                      scores[i]});
    }
    return dets;
  }

  // raw export: one (1, 4+nc, A) f32 tensor — postprocess here.
  const auto& pd = dims[0];
  if (pd.size() != 3) throw std::runtime_error("unexpected raw preds shape");
  const int channels = static_cast<int>(pd[1]);
  const int anchors = static_cast<int>(pd[2]);
  const float* preds = reinterpret_cast<const float*>(outs[0].data());
  auto cands = DecodeRawPredictions(preds, channels, anchors, conf_threshold);
  return NmsGreedy(std::move(cands), iou_threshold, max_det);
}

}  // namespace yolo_tpu
