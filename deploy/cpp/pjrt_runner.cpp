// paddle3d_tpu C++ inference runner over the PJRT C API.
//
// TPU-native equivalent of the reference's Paddle-Inference/TensorRT C++
// deploy mains (reference: deploy/{pointpillars,centerpoint,...}/cpp —
// 12.6k LoC of per-model TRT runners). Here ONE generic runner serves every
// exported model: tools/export.py emits a StableHLO module (weights baked
// in) and this binary dlopens a PJRT plugin (libtpu.so on a TPU host; any
// PJRT C-API plugin works), compiles the module once, and executes it on
// raw input tensors.
//
// Usage:
//   pjrt_runner --plugin /path/libtpu.so \
//               --model  exported/model.stablehlo.mlir \
//               --input  points.f32.bin --input_shape 1,40000,4 \
//               [--input_dtype f32] [--iters 100] [--output out]
//
// Outputs are written as out.0.bin, out.1.bin ... (raw bytes, row-major)
// plus out.spec listing sizes. --iters >1 reports amortized latency with a
// host fetch each iteration (the only sync that counts on TPU).
//
// Build: see deploy/cpp/build.sh (only needs a C++17 compiler, dlfcn and
// the single-header PJRT C API).

#include <dlfcn.h>

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

const PJRT_Api* g_api = nullptr;

std::string ErrorMessage(PJRT_Error* err) {
  PJRT_Error_Message_Args margs;
  std::memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  g_api->PJRT_Error_Message(&margs);
  std::string msg(margs.message, margs.message_size);
  PJRT_Error_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  g_api->PJRT_Error_Destroy(&dargs);
  return msg;
}

#define CHECK_PJRT(expr)                                              \
  do {                                                                \
    PJRT_Error* _err = (expr);                                        \
    if (_err != nullptr) {                                            \
      std::fprintf(stderr, "PJRT error at %s:%d: %s\n", __FILE__,     \
                   __LINE__, ErrorMessage(_err).c_str());             \
      return 1;                                                       \
    }                                                                 \
  } while (0)

void AwaitEvent(PJRT_Event* event) {
  if (event == nullptr) return;
  PJRT_Event_Await_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  args.event = event;
  PJRT_Error* err = g_api->PJRT_Event_Await(&args);
  if (err != nullptr) {
    std::fprintf(stderr, "PJRT event error: %s\n",
                 ErrorMessage(err).c_str());
  }
  PJRT_Event_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  dargs.event = event;
  g_api->PJRT_Event_Destroy(&dargs);
}

std::string ReadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    std::fprintf(stderr, "cannot read %s\n", path.c_str());
    std::exit(1);
  }
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

std::vector<int64_t> ParseShape(const std::string& s) {
  std::vector<int64_t> dims;
  std::stringstream ss(s);
  std::string item;
  while (std::getline(ss, item, ',')) dims.push_back(std::stoll(item));
  return dims;
}

PJRT_Buffer_Type ParseDtype(const std::string& s, size_t* elem_size) {
  if (s == "f32" || s == "float32") { *elem_size = 4; return PJRT_Buffer_Type_F32; }
  if (s == "bf16")                  { *elem_size = 2; return PJRT_Buffer_Type_BF16; }
  if (s == "s32" || s == "int32")   { *elem_size = 4; return PJRT_Buffer_Type_S32; }
  if (s == "u8"  || s == "uint8")   { *elem_size = 1; return PJRT_Buffer_Type_U8; }
  std::fprintf(stderr, "unsupported dtype %s\n", s.c_str());
  std::exit(1);
}

}  // namespace

// One model input tensor: file path (may be empty = zeros), shape, dtype.
// Repeat --input/--input_shape/--input_dtype per tensor; the flags after
// each --input apply to that tensor (multi-input models: camera batches
// carry img + lidar2imgs + depth_map + ...).
struct InputSpec {
  std::string path;
  std::string shape_str;
  std::string dtype_str = "f32";
};

int main(int argc, char** argv) {
  std::string plugin, model, output = "out";
  std::vector<InputSpec> inputs;
  // key=value PJRT client create-options (PJRT_NamedValue). String values
  // by default; int with "int:" prefix, e.g. --client_option
  // int:remote_compile=1
  std::vector<std::pair<std::string, std::string>> raw_options;
  int iters = 1;
  for (int i = 1; i < argc - 1; ++i) {
    std::string a = argv[i];
    if (a == "--plugin") plugin = argv[++i];
    else if (a == "--model") model = argv[++i];
    else if (a == "--input") {
      inputs.emplace_back();
      inputs.back().path = argv[++i];
    } else if (a == "--input_shape") {
      if (inputs.empty()) inputs.emplace_back();
      inputs.back().shape_str = argv[++i];
    } else if (a == "--input_dtype") {
      if (inputs.empty()) inputs.emplace_back();
      inputs.back().dtype_str = argv[++i];
    }
    else if (a == "--output") output = argv[++i];
    else if (a == "--iters") iters = std::atoi(argv[++i]);
    else if (a == "--client_option") {
      std::string kv = argv[++i];
      auto eq = kv.find('=');
      raw_options.emplace_back(kv.substr(0, eq), kv.substr(eq + 1));
    }
  }
  if (plugin.find("axon") != std::string::npos && raw_options.empty()) {
    // the axon tunnel plugin requires the same create-options its JAX
    // registration passes (axon/register/pjrt.py _register_backend)
    const char* gen = std::getenv("PALLAS_AXON_TPU_GEN");
    std::string topo = std::string(gen ? gen : "v5e") + ":1x1x1";
    const char* rc = std::getenv("PALLAS_AXON_REMOTE_COMPILE");
    raw_options = {
        {"int:remote_compile", (rc && std::string(rc) == "1") ? "1" : "0"},
        {"int:local_only", "0"},
        {"int:priority", "0"},
        {"topology", topo},
        {"int:n_slices", "1"},
        {"session_id",
         "pjrt-runner-" + std::to_string(
             std::chrono::duration_cast<std::chrono::nanoseconds>(
                 std::chrono::steady_clock::now().time_since_epoch())
                 .count())},
    };
    if (std::getenv("PALLAS_AXON_POOL_IPS") != nullptr) {
      setenv("AXON_POOL_SVC_OVERRIDE", "127.0.0.1", 0);
      setenv("AXON_LOOPBACK_RELAY", "1", 0);
      setenv("TPU_WORKER_HOSTNAMES", "localhost", 0);
    }
  }
  if (plugin.empty() || model.empty()) {
    std::fprintf(stderr,
                 "usage: pjrt_runner --plugin libtpu.so --model m.mlir "
                 "--input x.bin --input_shape 1,40000,4 [--input_dtype f32] "
                 "[--iters N] [--output out]\n");
    return 2;
  }

  // ---- load the PJRT plugin -------------------------------------------
  void* handle = dlopen(plugin.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (handle == nullptr) {
    std::fprintf(stderr, "dlopen(%s) failed: %s\n", plugin.c_str(),
                 dlerror());
    return 1;
  }
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api =
      reinterpret_cast<GetPjrtApiFn>(dlsym(handle, "GetPjrtApi"));
  if (get_api == nullptr) {
    std::fprintf(stderr, "plugin has no GetPjrtApi symbol: %s\n",
                 dlerror());
    return 1;
  }
  g_api = get_api();
  std::fprintf(stderr, "PJRT plugin loaded: api %d.%d\n",
               g_api->pjrt_api_version.major_version,
               g_api->pjrt_api_version.minor_version);

  if (g_api->PJRT_Plugin_Initialize != nullptr) {
    PJRT_Plugin_Initialize_Args init_args;
    std::memset(&init_args, 0, sizeof(init_args));
    init_args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    CHECK_PJRT(g_api->PJRT_Plugin_Initialize(&init_args));
  }

  // ---- client + device -------------------------------------------------
  std::vector<PJRT_NamedValue> options;
  std::vector<std::string> opt_keys;     // keep storage alive
  std::vector<std::string> opt_strs;
  std::vector<int64_t> opt_ints;
  opt_keys.reserve(raw_options.size());
  opt_strs.reserve(raw_options.size());
  opt_ints.reserve(raw_options.size());
  for (auto& kv : raw_options) {
    PJRT_NamedValue nv;
    std::memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    bool is_int = kv.first.rfind("int:", 0) == 0;
    opt_keys.push_back(is_int ? kv.first.substr(4) : kv.first);
    nv.name = opt_keys.back().c_str();
    nv.name_size = opt_keys.back().size();
    if (is_int) {
      opt_ints.push_back(std::stoll(kv.second));
      nv.type = PJRT_NamedValue_kInt64;
      nv.int64_value = opt_ints.back();
    } else {
      opt_strs.push_back(kv.second);
      nv.type = PJRT_NamedValue_kString;
      nv.string_value = opt_strs.back().c_str();
      nv.value_size = opt_strs.back().size();
    }
    options.push_back(nv);
  }
  PJRT_Client_Create_Args cargs;
  std::memset(&cargs, 0, sizeof(cargs));
  cargs.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cargs.create_options = options.empty() ? nullptr : options.data();
  cargs.num_options = options.size();
  CHECK_PJRT(g_api->PJRT_Client_Create(&cargs));
  PJRT_Client* client = cargs.client;

  PJRT_Client_AddressableDevices_Args dev_args;
  std::memset(&dev_args, 0, sizeof(dev_args));
  dev_args.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  dev_args.client = client;
  CHECK_PJRT(g_api->PJRT_Client_AddressableDevices(&dev_args));
  if (dev_args.num_addressable_devices == 0) {
    std::fprintf(stderr, "no addressable devices\n");
    return 1;
  }
  PJRT_Device* device = dev_args.addressable_devices[0];
  std::fprintf(stderr, "devices: %zu (using device 0)\n",
               dev_args.num_addressable_devices);

  // ---- compile the StableHLO module ------------------------------------
  std::string code = ReadFile(model);
  PJRT_Program program;
  std::memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = code.data();
  program.code_size = code.size();
  static const char kFormat[] = "mlir";
  program.format = kFormat;
  program.format_size = sizeof(kFormat) - 1;

  PJRT_Client_Compile_Args comp_args;
  std::memset(&comp_args, 0, sizeof(comp_args));
  comp_args.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  comp_args.client = client;
  comp_args.program = &program;
  // minimal serialized CompileOptionsProto: executable_build_options
  // (field 3, message) { num_replicas (field 4) = 1, num_partitions
  // (field 5) = 1 } — an EMPTY proto leaves num_replicas 0, which
  // strict plugins reject ("Number of replicas (0) must be at least 1")
  static const char kCompileOptions[] = {0x1a, 0x04, 0x20, 0x01,
                                         0x28, 0x01};
  comp_args.compile_options = kCompileOptions;
  comp_args.compile_options_size = sizeof(kCompileOptions);
  auto t0 = std::chrono::steady_clock::now();
  CHECK_PJRT(g_api->PJRT_Client_Compile(&comp_args));
  PJRT_LoadedExecutable* exec = comp_args.executable;
  auto t1 = std::chrono::steady_clock::now();
  std::fprintf(stderr, "compiled in %.1f s\n",
               std::chrono::duration<double>(t1 - t0).count());

  PJRT_LoadedExecutable_GetExecutable_Args ge_args;
  std::memset(&ge_args, 0, sizeof(ge_args));
  ge_args.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  ge_args.loaded_executable = exec;
  CHECK_PJRT(g_api->PJRT_LoadedExecutable_GetExecutable(&ge_args));
  PJRT_Executable_NumOutputs_Args no_args;
  std::memset(&no_args, 0, sizeof(no_args));
  no_args.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  no_args.executable = ge_args.executable;
  CHECK_PJRT(g_api->PJRT_Executable_NumOutputs(&no_args));
  size_t num_outputs = no_args.num_outputs;
  std::fprintf(stderr, "num outputs: %zu\n", num_outputs);

  // ---- inputs ----------------------------------------------------------
  if (inputs.empty()) inputs.emplace_back();  // zeros smoke-run default
  size_t num_inputs = inputs.size();
  std::vector<PJRT_Buffer_Type> dtypes(num_inputs);
  std::vector<std::vector<int64_t>> dims(num_inputs);
  std::vector<std::string> data(num_inputs);
  for (size_t k = 0; k < num_inputs; ++k) {
    size_t elem_size = 4;
    dtypes[k] = ParseDtype(inputs[k].dtype_str, &elem_size);
    dims[k] = ParseShape(inputs[k].shape_str);
    size_t n_elems = 1;
    for (int64_t d : dims[k]) n_elems *= static_cast<size_t>(d);
    if (!inputs[k].path.empty()) {
      data[k] = ReadFile(inputs[k].path);
      if (data[k].size() != n_elems * elem_size) {
        std::fprintf(stderr, "input %zu size %zu != shape size %zu\n", k,
                     data[k].size(), n_elems * elem_size);
        return 1;
      }
    } else {
      data[k].assign(n_elems * elem_size, '\0');  // zeros smoke-run
    }
  }

  double total_s = 0.0;
  std::vector<std::vector<char>> host_outputs(num_outputs);
  for (int it = 0; it < iters; ++it) {
    auto it0 = std::chrono::steady_clock::now();

    std::vector<PJRT_Buffer*> arg_list(num_inputs, nullptr);
    for (size_t k = 0; k < num_inputs; ++k) {
      PJRT_Client_BufferFromHostBuffer_Args bargs;
      std::memset(&bargs, 0, sizeof(bargs));
      bargs.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
      bargs.client = client;
      bargs.data = data[k].data();
      bargs.type = dtypes[k];
      bargs.dims = dims[k].data();
      bargs.num_dims = dims[k].size();
      bargs.host_buffer_semantics =
          PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
      bargs.device = device;
      CHECK_PJRT(g_api->PJRT_Client_BufferFromHostBuffer(&bargs));
      AwaitEvent(bargs.done_with_host_buffer);
      arg_list[k] = bargs.buffer;
    }

    PJRT_ExecuteOptions opts;
    std::memset(&opts, 0, sizeof(opts));
    opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

    PJRT_Buffer* const* arg_lists[1] = {arg_list.data()};
    std::vector<PJRT_Buffer*> out_list(num_outputs, nullptr);
    PJRT_Buffer** out_lists[1] = {out_list.data()};
    PJRT_Event* done = nullptr;

    PJRT_LoadedExecutable_Execute_Args eargs;
    std::memset(&eargs, 0, sizeof(eargs));
    eargs.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    eargs.executable = exec;
    eargs.options = &opts;
    eargs.argument_lists = arg_lists;
    eargs.num_devices = 1;
    eargs.num_args = num_inputs;
    eargs.output_lists = out_lists;
    eargs.device_complete_events = &done;
    CHECK_PJRT(g_api->PJRT_LoadedExecutable_Execute(&eargs));
    AwaitEvent(done);

    // fetch every output to host — the only true sync on TPU
    for (size_t o = 0; o < num_outputs; ++o) {
      PJRT_Buffer_ToHostBuffer_Args hargs;
      std::memset(&hargs, 0, sizeof(hargs));
      hargs.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
      hargs.src = out_list[o];
      hargs.dst = nullptr;  // query size
      CHECK_PJRT(g_api->PJRT_Buffer_ToHostBuffer(&hargs));
      host_outputs[o].resize(hargs.dst_size);
      hargs.dst = host_outputs[o].data();
      CHECK_PJRT(g_api->PJRT_Buffer_ToHostBuffer(&hargs));
      AwaitEvent(hargs.event);
      PJRT_Buffer_Destroy_Args bd;
      std::memset(&bd, 0, sizeof(bd));
      bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
      bd.buffer = out_list[o];
      CHECK_PJRT(g_api->PJRT_Buffer_Destroy(&bd));
    }
    for (size_t k = 0; k < num_inputs; ++k) {
      PJRT_Buffer_Destroy_Args bd;
      std::memset(&bd, 0, sizeof(bd));
      bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
      bd.buffer = arg_list[k];
      CHECK_PJRT(g_api->PJRT_Buffer_Destroy(&bd));
    }

    auto it1 = std::chrono::steady_clock::now();
    double dt = std::chrono::duration<double>(it1 - it0).count();
    if (it > 0 || iters == 1) total_s += dt;  // skip warm-up when timing
  }
  int timed = iters == 1 ? 1 : iters - 1;
  std::fprintf(stderr, "latency: %.3f ms/iter over %d iters\n",
               1e3 * total_s / timed, timed);

  std::ofstream spec(output + ".spec");
  for (size_t o = 0; o < num_outputs; ++o) {
    std::string path = output + "." + std::to_string(o) + ".bin";
    std::ofstream f(path, std::ios::binary);
    f.write(host_outputs[o].data(),
            static_cast<std::streamsize>(host_outputs[o].size()));
    spec << path << " " << host_outputs[o].size() << "\n";
  }
  std::fprintf(stderr, "wrote %zu outputs to %s.*.bin\n", num_outputs,
               output.c_str());
  return 0;
}
