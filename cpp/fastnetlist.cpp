// fastnetlist: native CSV netlist parser + MNA stamp compiler.
//
// The reference implementation's measured bottleneck is its host-side
// Python stamping loop (9.25 s vs 0.79 s solve at 40k nodes — SURVEY.md
// §2.3); nodal_tpu's Python front-end removes the per-element matrix
// writes but still pays Python dict/object costs per component.  This
// module does CSV text -> stamp tensors entirely in C++: tokenize, intern
// node/component names, elect ground, expand OPMODEL macromodels, number
// nodes/branches, and emit the same COO stamp template arrays as
// nodal_tpu/models/stamps.py (kept semantically identical; cross-validated
// by tests/test_native.py against the Python lowering on every fixture and
// on random netlists).
//
// Exposed through a C ABI consumed by ctypes (nodal_tpu/utils/native.py).

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

// Heterogeneous string lookup (avoids a std::string allocation per field
// on the hot interning path — matters at 1M-component netlists).
struct SvHash {
  using is_transparent = void;
  size_t operator()(std::string_view s) const {
    return std::hash<std::string_view>{}(s);
  }
  size_t operator()(const std::string& s) const {
    return std::hash<std::string_view>{}(s);
  }
};
struct SvEq {
  using is_transparent = void;
  bool operator()(std::string_view a, std::string_view b) const {
    return a == b;
  }
};
template <typename V>
using StringMap = std::unordered_map<std::string, V, SvHash, SvEq>;

namespace {

enum Type : int32_t { T_R = 0, T_A, T_E, T_VCVS, T_VCCS, T_CCVS, T_CCCS };

struct Comp {
  std::string name;
  int32_t type;
  double value;
  int32_t anode, bnode;        // node ids (interning order)
  int32_t cnode = -1, dnode = -1;
  int32_t driver = -1;         // component index
  std::string driver_name;
};

struct GEntry {
  int32_t row, col;
  double coeff;
  int32_t p1;
  int8_t e1;
  int32_t p2;
  int8_t e2;
};
struct REntry {
  int32_t row;
  double coeff;
  int32_t p1;
  int8_t e1;
  int32_t p2;
  int8_t e2;
};

struct Result {
  std::string error;
  std::vector<Comp> comps;
  std::vector<std::string> node_names;   // interning order
  StringMap<int32_t> node_lookup;
  std::vector<int32_t> degrees;
  int32_t ground = -1;
  std::vector<int32_t> nodenum;          // node id -> row index or -1 (ground)
  std::vector<int32_t> anom_of_comp;     // comp idx -> anom index or -1
  int32_t n_kcl = 0, n_be = 0;
  std::vector<GEntry> g;
  std::vector<REntry> r;
  std::vector<double> params;
};

struct Field {
  const char* p;
  size_t len;
  std::string str() const { return std::string(p, len); }
  bool eq(const char* s) const {
    return std::strlen(s) == len && std::memcmp(p, s, len) == 0;
  }
};

// Split one CSV line; skipinitialspace semantics (strip blanks after the
// delimiter, matching csv.reader(..., skipinitialspace=True)).
static void split_line(const char* b, const char* e, std::vector<Field>& out) {
  out.clear();
  const char* p = b;
  while (p <= e) {
    while (p < e && (*p == ' ' || *p == '\t')) ++p;
    const char* start = p;
    while (p < e && *p != ',') ++p;
    const char* stop = p;
    out.push_back({start, static_cast<size_t>(stop - start)});
    if (p >= e) break;
    ++p;  // skip comma
    if (p == e) {  // trailing comma -> empty field
      out.push_back({p, 0});
      break;
    }
  }
  if (out.size() == 1 && out[0].len == 0) out.clear();  // blank line
}

struct Builder {
  Result res;
  StringMap<int32_t> node_id;
  StringMap<int32_t> comp_id;
  std::vector<std::vector<std::string>> opmodel_rows;

  int32_t intern_node(std::string_view label) {
    auto it = node_id.find(label);
    if (it != node_id.end()) return it->second;
    int32_t id = static_cast<int32_t>(res.node_names.size());
    node_id.emplace(std::string(label), id);
    res.node_names.push_back(std::string(label));
    res.degrees.push_back(0);
    return id;
  }

  void reserve_hint(int64_t text_len) {
    // Grid/ladder netlists average ~25 bytes/row; reserve generously to
    // avoid rehash/realloc churn at the 1M-component scale.
    size_t rows = static_cast<size_t>(text_len / 20) + 16;
    res.comps.reserve(rows);
    node_id.reserve(rows);
    comp_id.reserve(rows);
    res.node_names.reserve(rows);
    res.degrees.reserve(rows);
    res.g.reserve(rows * 4);
    res.r.reserve(rows / 4 + 16);
  }

  bool fail(const std::string& msg) {
    if (res.error.empty()) res.error = msg;
    return false;
  }

  static bool parse_double(const Field& f, double* out) {
    if (f.len == 0) return false;
    // The field points into the (NUL-terminated) source buffer; strtod
    // stops at the delimiter, so no per-field copy is needed.
    char* end = nullptr;
    *out = std::strtod(f.p, &end);
    // Accept trailing blanks, matching Python's float() ("1.0 ," parses).
    const char* stop = f.p + f.len;
    while (end < stop && (*end == ' ' || *end == '\t')) ++end;
    return end == stop && end != f.p;
  }

  static int32_t type_of(const Field& f) {
    if (f.eq("R")) return T_R;
    if (f.eq("A")) return T_A;
    if (f.eq("E")) return T_E;
    if (f.eq("VCVS")) return T_VCVS;
    if (f.eq("VCCS")) return T_VCCS;
    if (f.eq("CCVS")) return T_CCVS;
    if (f.eq("CCCS")) return T_CCCS;
    return -1;
  }

  bool process_row(const std::vector<Field>& f) {
    if (f.empty() || (f[0].len > 0 && f[0].p[0] == '#')) return true;
    if (f.size() < 5)
      return fail("Missing arguments for component " + f[0].str());
    std::string name = f[0].str();

    if (f[1].eq("OPMODEL")) {
      if (f.size() != 7)
        return fail("Wrong number of arguments for component " + name);
      double rf_num;
      if (!parse_double(f[2], &rf_num))
        return fail("Bad input: expected a number for component value of " +
                    name);
      // [name, OPMODEL, rf, out, ground, pos, neg]  (reference
      // nodal.py:45-85): Ri pos-neg, Ro phony-out, VCVS gain phony-ground
      // controlled by (pos, neg), feedback R iff rf != "0".
      std::string rf = f[2].str(), out = f[3].str(), gnd = f[4].str(),
                  pos = f[5].str(), neg = f[6].str();
      std::string phony = name + "_internal_node";
      opmodel_rows.push_back({name + "_ri", "R", "10000000.0", pos, neg});
      opmodel_rows.push_back({name + "_ro", "R", "10.0", phony, out});
      opmodel_rows.push_back(
          {name + "_vcvs", "VCVS", "100000.0", phony, gnd, pos, neg});
      if (rf != "0") {
        opmodel_rows.push_back({name + "_rf", "R", rf, neg, out});
      } else if (neg != out) {
        return fail("OPMODEL " + name +
                    ": direct feedback (rf=0) requires the inverting "
                    "terminal to coincide with the output");
      }
      return true;
    }
    if (f[1].eq("OPAMP")) return fail("OPAMP has no device model; use OPMODEL");

    int32_t t = type_of(f[1]);
    if (t < 0)
      return fail("Unknown type " + f[1].str() + " for component " + name);
    size_t arity = (t == T_R || t == T_A || t == T_E)  ? 5
                   : (t == T_VCVS || t == T_VCCS)      ? 7
                                                        : 8;
    if (f.size() != arity)
      return fail("Wrong number of arguments for component " + name);
    Comp c;
    c.name = name;
    c.type = t;
    if (!parse_double(f[2], &c.value))
      return fail("Bad input: expected a number for component value of " +
                  name);
    c.anode = intern_node(std::string_view(f[3].p, f[3].len));
    c.bnode = intern_node(std::string_view(f[4].p, f[4].len));
    if (arity >= 7) {
      c.cnode = intern_node(std::string_view(f[5].p, f[5].len));
      c.dnode = intern_node(std::string_view(f[6].p, f[6].len));
    }
    if (arity == 8) c.driver_name = f[7].str();
    if (comp_id.count(name))
      return fail("Duplicate component name " + name);
    comp_id.emplace(name, static_cast<int32_t>(res.comps.size()));
    res.degrees[c.anode] += 1;
    res.degrees[c.bnode] += 1;
    res.comps.push_back(std::move(c));
    return true;
  }

  bool process_string_row(const std::vector<std::string>& row) {
    std::vector<Field> f;
    f.reserve(row.size());
    for (const auto& s : row) f.push_back({s.data(), s.size()});
    return process_row(f);
  }

  bool finalize() {
    // Deferred OPMODEL rows (may themselves intern new nodes).
    auto pending = std::move(opmodel_rows);
    opmodel_rows.clear();
    for (const auto& row : pending)
      if (!process_string_row(row)) return false;
    if (res.comps.empty()) return fail("Empty netlist: no components found");

    // Ground: explicit "g" wins, else max degree, first-appearance ties.
    auto git = node_id.find(std::string_view("g"));
    if (git != node_id.end()) {
      res.ground = git->second;
    } else {
      int32_t best = 0;
      for (size_t i = 1; i < res.degrees.size(); ++i)
        if (res.degrees[i] > res.degrees[best])
          best = static_cast<int32_t>(i);
      res.ground = best;
    }

    res.nodenum.assign(res.node_names.size(), -1);
    int32_t k = 0;
    for (size_t i = 0; i < res.node_names.size(); ++i)
      if (static_cast<int32_t>(i) != res.ground)
        res.nodenum[i] = k++;
    res.n_kcl = k;

    res.anom_of_comp.assign(res.comps.size(), -1);
    int32_t a = 0;
    for (size_t i = 0; i < res.comps.size(); ++i) {
      int32_t t = res.comps[i].type;
      if (t == T_E || t == T_VCVS || t == T_VCCS || t == T_CCVS || t == T_CCCS)
        res.anom_of_comp[i] = a++;
    }
    res.n_be = a;

    // Resolve drivers.
    for (auto& c : res.comps) {
      if (c.type == T_CCVS || c.type == T_CCCS) {
        auto it = comp_id.find(c.driver_name);
        if (it == comp_id.end())
          return fail("Driving component " + c.driver_name + " not found");
        c.driver = it->second;
      }
    }
    return stamp();
  }

  // --- stamp templates: must match nodal_tpu/models/stamps.py exactly ---

  int32_t N(int32_t node) const {  // row index or -1 for ground
    return res.nodenum[node];
  }
  int32_t BR(size_t comp_idx) const {
    return res.n_kcl + res.anom_of_comp[comp_idx];
  }
  void G(int32_t row, int32_t col, double coeff, int32_t p1 = 0,
         int8_t e1 = 0, int32_t p2 = 0, int8_t e2 = 0) {
    if (row < 0 || col < 0) return;
    res.g.push_back({row, col, coeff, p1, e1, p2, e2});
  }
  void RHS(int32_t row, double coeff, int32_t p1 = 0, int8_t e1 = 0,
           int32_t p2 = 0, int8_t e2 = 0) {
    if (row < 0) return;
    res.r.push_back({row, coeff, p1, e1, p2, e2});
  }
  void couple(const Comp& c, int32_t br) {
    G(br, N(c.anode), 1.0);
    G(N(c.anode), br, -1.0);
    G(br, N(c.bnode), -1.0);
    G(N(c.bnode), br, 1.0);
  }

  bool check_control(const Comp& c, const Comp& d, bool* aligned) {
    if (c.cnode == d.anode && c.dnode == d.bnode) {
      *aligned = true;
      return true;
    }
    if (c.cnode == d.bnode && c.dnode == d.anode) {
      *aligned = false;
      return true;
    }
    return fail("Control nodes of " + c.name +
                " do not coincide with terminals of driver " + d.name);
  }

  bool stamp() {
    res.params.reserve(res.comps.size());
    for (const auto& c : res.comps) res.params.push_back(c.value);

    for (size_t i = 0; i < res.comps.size(); ++i) {
      const Comp& c = res.comps[i];
      int32_t s = static_cast<int32_t>(i);
      switch (c.type) {
        case T_R: {
          if (c.value == 0.0)
            return fail("Model error: resistors can't have null resistance");
          int32_t a = N(c.anode), b = N(c.bnode);
          G(a, a, 1.0, s, -1);
          G(b, b, 1.0, s, -1);
          G(a, b, -1.0, s, -1);
          G(b, a, -1.0, s, -1);
          break;
        }
        case T_A:
          RHS(N(c.anode), 1.0, s, 1);
          RHS(N(c.bnode), -1.0, s, 1);
          break;
        case T_E: {
          int32_t br = BR(i);
          RHS(br, 1.0, s, 1);
          couple(c, br);
          break;
        }
        case T_VCVS: {
          int32_t br = BR(i);
          couple(c, br);
          G(br, N(c.cnode), -1.0, s, 1);
          G(br, N(c.dnode), 1.0, s, 1);
          break;
        }
        case T_VCCS: {
          int32_t br = BR(i);
          G(N(c.anode), br, -1.0);
          G(N(c.bnode), br, 1.0);
          G(br, br, 1.0);
          G(br, N(c.cnode), -1.0, s, 1);
          G(br, N(c.dnode), 1.0, s, 1);
          break;
        }
        case T_CCVS:
        case T_CCCS: {
          int32_t br = BR(i);
          const Comp& d = res.comps[c.driver];
          bool aligned = true;
          if (c.type == T_CCVS) {
            if (!check_control(c, d, &aligned)) return false;
            couple(c, br);
          } else {
            G(N(c.anode), br, -1.0);
            G(N(c.bnode), br, 1.0);
            G(br, br, 1.0);
          }
          int32_t sd = c.driver;
          if (d.type == T_R) {
            if (c.type == T_CCCS && !check_control(c, d, &aligned))
              return false;
            G(br, N(c.cnode), 1.0, s, 1, sd, -1);
            G(br, N(c.dnode), -1.0, s, 1, sd, -1);
          } else if (d.type == T_A) {
            RHS(br, 1.0, s, 1, sd, 1);
          } else {  // anomalous driver
            if (c.type == T_CCCS && !check_control(c, d, &aligned))
              return false;
            G(br, BR(c.driver), aligned ? -1.0 : 1.0, s, 1);
          }
          break;
        }
      }
    }
    return true;
  }
};

Result* parse_impl(const char* text, int64_t len) {
  auto* out = new Result();
  Builder b;
  b.res.error.clear();
  b.reserve_hint(len);
  const char* p = text;
  const char* end = text + len;
  std::vector<Field> fields;
  bool ok = true;
  while (ok && p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    const char* line_end = nl ? nl : end;
    // Trim trailing \r.
    const char* le = line_end;
    if (le > p && le[-1] == '\r') --le;
    split_line(p, le, fields);
    ok = b.process_row(fields);
    p = nl ? nl + 1 : end;
  }
  if (ok) ok = b.finalize();
  b.res.node_lookup = std::move(b.node_id);
  *out = std::move(b.res);
  return out;
}

}  // namespace

extern "C" {

void* fn_parse(const char* text, int64_t len) { return parse_impl(text, len); }

const char* fn_error(void* h) {
  auto* r = static_cast<Result*>(h);
  return r->error.empty() ? nullptr : r->error.c_str();
}

// Sizes: [n_components, n_nodes, n_kcl, n_be, nnz_g, nnz_rhs, ground_id]
void fn_sizes(void* h, int64_t* out) {
  auto* r = static_cast<Result*>(h);
  out[0] = static_cast<int64_t>(r->comps.size());
  out[1] = static_cast<int64_t>(r->node_names.size());
  out[2] = r->n_kcl;
  out[3] = r->n_be;
  out[4] = static_cast<int64_t>(r->g.size());
  out[5] = static_cast<int64_t>(r->r.size());
  out[6] = r->ground;
}

void fn_fill_stamps(void* h, int32_t* g_rows, int32_t* g_cols, double* g_coeff,
                    int32_t* g_p1, int8_t* g_e1, int32_t* g_p2, int8_t* g_e2,
                    int32_t* r_rows, double* r_coeff, int32_t* r_p1,
                    int8_t* r_e1, int32_t* r_p2, int8_t* r_e2, double* params) {
  auto* r = static_cast<Result*>(h);
  for (size_t i = 0; i < r->g.size(); ++i) {
    const auto& e = r->g[i];
    g_rows[i] = e.row;
    g_cols[i] = e.col;
    g_coeff[i] = e.coeff;
    g_p1[i] = e.p1;
    g_e1[i] = e.e1;
    g_p2[i] = e.p2;
    g_e2[i] = e.e2;
  }
  for (size_t i = 0; i < r->r.size(); ++i) {
    const auto& e = r->r[i];
    r_rows[i] = e.row;
    r_coeff[i] = e.coeff;
    r_p1[i] = e.p1;
    r_e1[i] = e.e1;
    r_p2[i] = e.p2;
    r_e2[i] = e.e2;
  }
  for (size_t i = 0; i < r->params.size(); ++i) params[i] = r->params[i];
}

// Name table access: kind 0 = node name (by node id), 1 = component name.
int64_t fn_name(void* h, int32_t kind, int64_t idx, char* buf, int64_t cap) {
  auto* r = static_cast<Result*>(h);
  const std::string* s = nullptr;
  if (kind == 0 && idx >= 0 && idx < (int64_t)r->node_names.size())
    s = &r->node_names[idx];
  else if (kind == 1 && idx >= 0 && idx < (int64_t)r->comps.size())
    s = &r->comps[idx].name;
  if (!s) return -1;
  int64_t n = static_cast<int64_t>(s->size());
  if (n > cap) return -n;
  std::memcpy(buf, s->data(), n);
  return n;
}

// Per-component: nodenum row of anode/bnode (-1 ground), anom index (-1).
void fn_fill_tables(void* h, int32_t* nodenum, int32_t* anom_of_comp,
                    int32_t* comp_type) {
  auto* r = static_cast<Result*>(h);
  for (size_t i = 0; i < r->nodenum.size(); ++i) nodenum[i] = r->nodenum[i];
  for (size_t i = 0; i < r->comps.size(); ++i) {
    anom_of_comp[i] = r->anom_of_comp[i];
    comp_type[i] = r->comps[i].type;
  }
}

// Lookup node ids by name without materializing Python dicts
// (matters for 1M-node generated netlists).
int64_t fn_node_id(void* h, const char* name) {
  auto* r = static_cast<Result*>(h);
  auto it = r->node_lookup.find(std::string_view(name));
  return it == r->node_lookup.end() ? -1 : it->second;
}

void fn_free(void* h) { delete static_cast<Result*>(h); }

}  // extern "C"
