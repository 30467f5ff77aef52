// SMARTS subset matcher for multimodalanalytical-tpu.
//
// Covers the constructs used by the framework's 37 functional-group patterns
// (configuration.py DEFAULT_FUNC_GROUP_SMARTS; reference relied on RDKit's
// GetSubstructMatches, reference data_utils.py:132-141):
//   * atom primitives: #n, aliphatic symbol (C N O S P F Cl Br I ...),
//     aromatic lowercase (c n o s p), a/A, *, X<n> (total connectivity),
//     D<n> (explicit degree), H<n> (total H count), +/- charge,
//     $(...) recursive SMARTS;
//   * boolean operators: ! (not), & and implicit adjacency (and, high),
//     , (or), ; (and, low);
//   * bond primitives: - = # : ~ and default (single-or-aromatic);
//   * branches and ring closures.
//
// Exposed as a presence test (afm_smarts_match) because the framework's
// featurizer only needs has-match (reference data_utils.py:139: n == 0 -> 0
// else 1).
//
// This file #includes chem.cpp's graph/parse machinery by being compiled
// into the same shared object (see smiles.py build command).

#include <memory>
#include <string>
#include <vector>

// Pull in the molecule representation from chem.cpp via a shared header-style
// include guard: chem.cpp defines everything in an anonymous namespace, so
// this file is compiled together with it via #include.

namespace smarts {

struct PatternBond;

enum PrimKind {
  PRIM_ANY,          // *
  PRIM_ELEM,         // #n or symbol
  PRIM_AROMATIC,     // a (or lowercase symbol combined with PRIM_ELEM)
  PRIM_ALIPHATIC,    // A (or uppercase symbol combined with PRIM_ELEM)
  PRIM_CONNECTIVITY, // X<n> (degree + nH)
  PRIM_DEGREE,       // D<n> (explicit degree)
  PRIM_HCOUNT,       // H<n>
  PRIM_CHARGE,       // +n / -n
  PRIM_RECURSIVE,    // $(...)
};

struct PatternGraph;

struct AtomExpr {
  // Node kinds: 0 prim, 1 not, 2 and, 3 or
  int kind = 0;
  PrimKind prim = PRIM_ANY;
  int value = 0;
  std::shared_ptr<PatternGraph> recursive;
  std::vector<std::shared_ptr<AtomExpr>> children;
};

enum BondKind {
  BONDP_DEFAULT,   // single or aromatic
  BONDP_SINGLE,
  BONDP_DOUBLE,
  BONDP_TRIPLE,
  BONDP_AROMATIC,
  BONDP_ANY,
};

struct PatternAtom {
  std::shared_ptr<AtomExpr> expr;
  std::vector<int> bonds;  // indices into PatternGraph::bonds
};

struct PatternBond {
  int a = -1, b = -1;
  BondKind kind = BONDP_DEFAULT;
  int other(int x) const { return x == a ? b : a; }
};

struct PatternGraph {
  std::vector<PatternAtom> atoms;
  std::vector<PatternBond> bonds;
};

// ---------------------------------------------------------------------------
// SMARTS parser
// ---------------------------------------------------------------------------

class SmartsParser {
 public:
  explicit SmartsParser(std::string s) : s_(std::move(s)) {}

  bool parse(PatternGraph* out) {
    graph_ = out;
    size_t i = 0;
    return parse_chain(i, -1, BONDP_DEFAULT) && i_consumed_;
  }

 private:
  bool parse_chain(size_t& i, int prev, BondKind pending) {
    std::vector<int> stack;
    std::map<int, std::pair<int, BondKind>> open_rings;
    while (i < s_.size()) {
      char c = s_[i];
      if (c == '(') {
        if (prev < 0) return false;
        stack.push_back(prev);
        ++i;
      } else if (c == ')') {
        if (stack.empty()) return false;
        prev = stack.back();
        stack.pop_back();
        ++i;
      } else if (c == '-') { pending = BONDP_SINGLE; ++i; }
      else if (c == '=') { pending = BONDP_DOUBLE; ++i; }
      else if (c == '#' && i + 1 < s_.size() && !isdigit(s_[i + 1])) {
        pending = BONDP_TRIPLE; ++i;
      }
      else if (c == ':') { pending = BONDP_AROMATIC; ++i; }
      else if (c == '~') { pending = BONDP_ANY; ++i; }
      else if (isdigit(c)) {
        int ring = c - '0';
        ++i;
        if (prev < 0) return false;
        auto it = open_rings.find(ring);
        if (it == open_rings.end()) {
          open_rings[ring] = {prev, pending};
        } else {
          BondKind kind = pending != BONDP_DEFAULT ? pending : it->second.second;
          add_bond(it->second.first, prev, kind);
          open_rings.erase(it);
        }
        pending = BONDP_DEFAULT;
      } else {
        int idx = parse_atom(i);
        if (idx < 0) return false;
        if (prev >= 0) add_bond(prev, idx, pending);
        pending = BONDP_DEFAULT;
        prev = idx;
      }
    }
    i_consumed_ = stack.empty() && open_rings.empty();
    return i_consumed_;
  }

  void add_bond(int a, int b, BondKind kind) {
    PatternBond bond;
    bond.a = a; bond.b = b; bond.kind = kind;
    graph_->bonds.push_back(bond);
    int idx = static_cast<int>(graph_->bonds.size()) - 1;
    graph_->atoms[a].bonds.push_back(idx);
    graph_->atoms[b].bonds.push_back(idx);
  }

  int parse_atom(size_t& i) {
    PatternAtom atom;
    char c = s_[i];
    if (c == '[') {
      size_t depth = 1;
      size_t end = i + 1;
      while (end < s_.size() && depth) {
        if (s_[end] == '[') ++depth;
        if (s_[end] == ']') --depth;
        ++end;
      }
      if (depth) return -1;
      std::string body = s_.substr(i + 1, end - i - 2);
      i = end;
      atom.expr = parse_expr_low(body);
      if (!atom.expr) return -1;
    } else {
      // bare atom outside brackets
      auto expr = std::make_shared<AtomExpr>();
      if (c == '*') {
        expr->prim = PRIM_ANY;
        ++i;
      } else {
        std::string sym;
        bool aromatic = islower(c);
        sym += static_cast<char>(toupper(c));
        ++i;
        if ((sym == "C" && i < s_.size() && s_[i] == 'l') ||
            (sym == "B" && i < s_.size() && s_[i] == 'r')) {
          sym += s_[i];
          ++i;
        }
        int z = symbol_to_number(sym);
        if (z < 0) return -1;
        auto and_expr = std::make_shared<AtomExpr>();
        and_expr->kind = 2;
        auto elem = std::make_shared<AtomExpr>();
        elem->prim = PRIM_ELEM;
        elem->value = z;
        auto arom = std::make_shared<AtomExpr>();
        arom->prim = aromatic ? PRIM_AROMATIC : PRIM_ALIPHATIC;
        and_expr->children = {elem, arom};
        expr = and_expr;
      }
      atom.expr = expr;
    }
    graph_->atoms.push_back(atom);
    return static_cast<int>(graph_->atoms.size()) - 1;
  }

  // Expression grammar: low = mid (';' mid)*; mid = high (',' high)*;
  // high = unary (('&'|adjacent) unary)*; unary = '!' unary | primitive.
  std::shared_ptr<AtomExpr> parse_expr_low(const std::string& body) {
    size_t pos = 0;
    auto expr = parse_low(body, pos);
    if (!expr || pos != body.size()) return nullptr;
    return expr;
  }

  std::shared_ptr<AtomExpr> parse_low(const std::string& b, size_t& pos) {
    auto left = parse_mid(b, pos);
    if (!left) return nullptr;
    while (pos < b.size() && b[pos] == ';') {
      ++pos;
      auto right = parse_mid(b, pos);
      if (!right) return nullptr;
      auto node = std::make_shared<AtomExpr>();
      node->kind = 2;
      node->children = {left, right};
      left = node;
    }
    return left;
  }

  std::shared_ptr<AtomExpr> parse_mid(const std::string& b, size_t& pos) {
    auto left = parse_high(b, pos);
    if (!left) return nullptr;
    while (pos < b.size() && b[pos] == ',') {
      ++pos;
      auto right = parse_high(b, pos);
      if (!right) return nullptr;
      auto node = std::make_shared<AtomExpr>();
      node->kind = 3;
      node->children = {left, right};
      left = node;
    }
    return left;
  }

  std::shared_ptr<AtomExpr> parse_high(const std::string& b, size_t& pos) {
    auto left = parse_unary(b, pos);
    if (!left) return nullptr;
    while (pos < b.size() && b[pos] != ';' && b[pos] != ',') {
      if (b[pos] == '&') ++pos;
      auto right = parse_unary(b, pos);
      if (!right) return nullptr;
      auto node = std::make_shared<AtomExpr>();
      node->kind = 2;
      node->children = {left, right};
      left = node;
    }
    return left;
  }

  std::shared_ptr<AtomExpr> parse_unary(const std::string& b, size_t& pos) {
    if (pos < b.size() && b[pos] == '!') {
      ++pos;
      auto inner = parse_unary(b, pos);
      if (!inner) return nullptr;
      auto node = std::make_shared<AtomExpr>();
      node->kind = 1;
      node->children = {inner};
      return node;
    }
    return parse_primitive(b, pos);
  }

  std::shared_ptr<AtomExpr> parse_primitive(const std::string& b, size_t& pos) {
    if (pos >= b.size()) return nullptr;
    auto node = std::make_shared<AtomExpr>();
    char c = b[pos];

    auto read_int = [&](int fallback) {
      int value = 0;
      bool seen = false;
      while (pos < b.size() && isdigit(b[pos])) {
        value = value * 10 + (b[pos] - '0');
        ++pos;
        seen = true;
      }
      return seen ? value : fallback;
    };

    if (c == '#') {
      ++pos;
      node->prim = PRIM_ELEM;
      node->value = read_int(-1);
      if (node->value < 0) return nullptr;
      return node;
    }
    if (c == '$') {
      if (pos + 1 >= b.size() || b[pos + 1] != '(') return nullptr;
      size_t depth = 1;
      size_t end = pos + 2;
      while (end < b.size() && depth) {
        if (b[end] == '(') ++depth;
        if (b[end] == ')') --depth;
        ++end;
      }
      if (depth) return nullptr;
      std::string inner = b.substr(pos + 2, end - pos - 3);
      pos = end;
      auto sub = std::make_shared<PatternGraph>();
      SmartsParser sub_parser(inner);
      if (!sub_parser.parse(sub.get())) return nullptr;
      node->prim = PRIM_RECURSIVE;
      node->recursive = sub;
      return node;
    }
    if (c == '*') { ++pos; node->prim = PRIM_ANY; return node; }
    if (c == 'a') { ++pos; node->prim = PRIM_AROMATIC; return node; }
    if (c == 'A') { ++pos; node->prim = PRIM_ALIPHATIC; return node; }
    if (c == 'X') { ++pos; node->prim = PRIM_CONNECTIVITY; node->value = read_int(1); return node; }
    if (c == 'D') { ++pos; node->prim = PRIM_DEGREE; node->value = read_int(1); return node; }
    if (c == 'H') { ++pos; node->prim = PRIM_HCOUNT; node->value = read_int(1); return node; }
    if (c == '+') { ++pos; node->prim = PRIM_CHARGE; node->value = read_int(1); return node; }
    if (c == '-') { ++pos; node->prim = PRIM_CHARGE; node->value = -read_int(1); return node; }

    if (isupper(c)) {
      std::string sym(1, c);
      ++pos;
      if (pos < b.size() && islower(b[pos])) {
        std::string two = sym + b[pos];
        if (symbol_to_number(two) > 0) {
          sym = two;
          ++pos;
        }
      }
      int z = symbol_to_number(sym);
      if (z < 0) return nullptr;
      auto elem = std::make_shared<AtomExpr>();
      elem->prim = PRIM_ELEM;
      elem->value = z;
      auto arom = std::make_shared<AtomExpr>();
      arom->prim = PRIM_ALIPHATIC;
      node->kind = 2;
      node->children = {elem, arom};
      return node;
    }
    if (islower(c)) {
      std::string sym(1, static_cast<char>(toupper(c)));
      ++pos;
      int z = symbol_to_number(sym);
      if (z < 0) return nullptr;
      auto elem = std::make_shared<AtomExpr>();
      elem->prim = PRIM_ELEM;
      elem->value = z;
      auto arom = std::make_shared<AtomExpr>();
      arom->prim = PRIM_AROMATIC;
      node->kind = 2;
      node->children = {elem, arom};
      return node;
    }
    return nullptr;
  }

  // Held by value: callers may pass temporaries (e.g. the C ABI shim).
  std::string s_;
  PatternGraph* graph_ = nullptr;
  bool i_consumed_ = false;
};

// ---------------------------------------------------------------------------
// Matcher
// ---------------------------------------------------------------------------

bool atom_matches(const Mol& mol, int atom_idx, const AtomExpr& expr);

bool match_from(const Mol& mol, const PatternGraph& pattern, int pattern_atom,
                int mol_atom, std::vector<int>* assignment);

bool eval_prim(const Mol& mol, int atom_idx, const AtomExpr& expr) {
  const Atom& atom = mol.atoms[atom_idx];
  switch (expr.prim) {
    case PRIM_ANY: return true;
    case PRIM_ELEM: return atom.z == expr.value;
    case PRIM_AROMATIC: return atom.aromatic;
    case PRIM_ALIPHATIC: return !atom.aromatic;
    case PRIM_CONNECTIVITY:
      return static_cast<int>(atom.bonds.size()) + atom.n_h == expr.value;
    case PRIM_DEGREE:
      return static_cast<int>(atom.bonds.size()) == expr.value;
    case PRIM_HCOUNT: return atom.n_h == expr.value;
    case PRIM_CHARGE: return atom.charge == expr.value;
    case PRIM_RECURSIVE: {
      std::vector<int> assignment(expr.recursive->atoms.size(), -1);
      return match_from(mol, *expr.recursive, 0, atom_idx, &assignment);
    }
  }
  return false;
}

bool atom_matches(const Mol& mol, int atom_idx, const AtomExpr& expr) {
  switch (expr.kind) {
    case 0: return eval_prim(mol, atom_idx, expr);
    case 1: return !atom_matches(mol, atom_idx, *expr.children[0]);
    case 2:
      for (const auto& child : expr.children) {
        if (!atom_matches(mol, atom_idx, *child)) return false;
      }
      return true;
    case 3:
      for (const auto& child : expr.children) {
        if (atom_matches(mol, atom_idx, *child)) return true;
      }
      return false;
  }
  return false;
}

bool bond_matches(const Mol& mol, const Bond& bond, BondKind kind) {
  switch (kind) {
    case BONDP_ANY: return true;
    case BONDP_SINGLE: return bond.order == BOND_SINGLE;
    case BONDP_DOUBLE: return bond.order == BOND_DOUBLE;
    case BONDP_TRIPLE: return bond.order == BOND_TRIPLE;
    case BONDP_AROMATIC: return bond.order == BOND_AROMATIC;
    case BONDP_DEFAULT:
      return bond.order == BOND_SINGLE || bond.order == BOND_AROMATIC;
  }
  return false;
}

// Backtracking: extend the partial assignment of pattern atoms -> mol atoms.
bool extend_match(const Mol& mol, const PatternGraph& pattern,
                  std::vector<int>* assignment) {
  // Pick the first unassigned pattern atom adjacent to an assigned one.
  int next = -1, anchor = -1, via_bond = -1;
  for (size_t p = 0; p < pattern.atoms.size() && next < 0; ++p) {
    if ((*assignment)[p] < 0) continue;
    for (int bidx : pattern.atoms[p].bonds) {
      const PatternBond& pb = pattern.bonds[bidx];
      int q = pb.other(static_cast<int>(p));
      if ((*assignment)[q] < 0) {
        next = q;
        anchor = static_cast<int>(p);
        via_bond = bidx;
        break;
      }
    }
  }
  if (next < 0) {
    // All connected atoms assigned; verify every pattern bond.
    for (const auto& pb : pattern.bonds) {
      int ma = (*assignment)[pb.a], mb = (*assignment)[pb.b];
      if (ma < 0 || mb < 0) return false;
      bool found = false;
      for (int bidx : mol.atoms[ma].bonds) {
        const Bond& bond = mol.bonds[bidx];
        if (bond.other(ma) == mb && bond_matches(mol, bond, pb.kind)) {
          found = true;
          break;
        }
      }
      if (!found) return false;
    }
    return true;
  }

  int mol_anchor = (*assignment)[anchor];
  const PatternBond& pb = pattern.bonds[via_bond];
  for (int bidx : mol.atoms[mol_anchor].bonds) {
    const Bond& bond = mol.bonds[bidx];
    if (!bond_matches(mol, bond, pb.kind)) continue;
    int candidate = bond.other(mol_anchor);
    // injectivity
    bool used = false;
    for (int assigned : *assignment) {
      if (assigned == candidate) { used = true; break; }
    }
    if (used) continue;
    if (!atom_matches(mol, candidate, *pattern.atoms[next].expr)) continue;
    (*assignment)[next] = candidate;
    if (extend_match(mol, pattern, assignment)) return true;
    (*assignment)[next] = -1;
  }
  return false;
}

bool match_from(const Mol& mol, const PatternGraph& pattern, int pattern_atom,
                int mol_atom, std::vector<int>* assignment) {
  if (!atom_matches(mol, mol_atom, *pattern.atoms[pattern_atom].expr)) {
    return false;
  }
  (*assignment)[pattern_atom] = mol_atom;
  bool ok = extend_match(mol, pattern, assignment);
  if (!ok) (*assignment)[pattern_atom] = -1;
  return ok;
}

bool has_match(const Mol& mol, const PatternGraph& pattern) {
  if (pattern.atoms.empty()) return false;
  for (size_t m = 0; m < mol.atoms.size(); ++m) {
    std::vector<int> assignment(pattern.atoms.size(), -1);
    if (match_from(mol, pattern, 0, static_cast<int>(m), &assignment)) {
      return true;
    }
  }
  return false;
}

}  // namespace smarts

extern "C" {

// Returns 1 if the molecule contains the SMARTS pattern, 0 if not,
// -1 on molecule parse failure, -2 on pattern parse failure.
int afm_smarts_match(const char* smiles, const char* pattern) {
  Mol mol;
  if (!parse_and_sanitize(smiles, &mol)) return -1;
  smarts::PatternGraph graph;
  smarts::SmartsParser parser(pattern ? std::string(pattern) : std::string());
  if (!parser.parse(&graph)) return -2;
  return smarts::has_match(mol, graph) ? 1 : 0;
}

}  // extern "C"
