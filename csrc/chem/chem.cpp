// First-party SMILES chemistry kernel for multimodalanalytical-tpu.
//
// The reference framework relies on RDKit (C++) for SMILES parsing,
// canonicalisation, molecular formulas and randomized SMILES
// (reference: src/analytical_fm/utils.py:22-41, generation/logit_processors.py,
// data/augmentations.py:42-46).  This library provides those capabilities as
// a small standalone C++ engine exposed through a C ABI (ctypes-friendly).
//
// Capabilities:
//   * SMILES parsing (organic subset + brackets, branches, ring closures,
//     multi-fragment, charges, isotopes, tetrahedral stereo),
//   * valence validation and implicit-H assignment,
//   * aromaticity perception (Hueckel per-ring + fused-pair pass) and
//     kekulization-based validation of aromatic systems,
//   * canonical SMILES output via iterative partition refinement
//     (Weisfeiler-Lehman) with branch-and-min tie-breaking,
//   * cis/trans (E/Z) double-bond stereo: directional marks are perceived
//     into per-bond configurations and re-emitted canonically,
//   * Hill-order molecular formula with net charge,
//   * randomized (non-canonical) SMILES enumeration,
//   * per-element atom counts (for formula-guided decoding).
//
// Intentional deviations from RDKit (documented framework caveats):
//   * canonical strings are NOT byte-identical to RDKit's; they are a
//     consistent canonical form (same molecule -> same string), which is what
//     exact-match Top-N scoring requires.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <functional>
#include <cstring>
#include <map>
#include <random>
#include <set>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Periodic table (subset)
// ---------------------------------------------------------------------------

struct ElementInfo {
  const char* symbol;
  int number;
};

static const ElementInfo kElements[] = {
    {"H", 1},   {"He", 2},  {"Li", 3},  {"Be", 4},  {"B", 5},   {"C", 6},
    {"N", 7},   {"O", 8},   {"F", 9},   {"Ne", 10}, {"Na", 11}, {"Mg", 12},
    {"Al", 13}, {"Si", 14}, {"P", 15},  {"S", 16},  {"Cl", 17}, {"Ar", 18},
    {"K", 19},  {"Ca", 20}, {"Ti", 22}, {"Cr", 24}, {"Mn", 25}, {"Fe", 26},
    {"Co", 27}, {"Ni", 28}, {"Cu", 29}, {"Zn", 30}, {"Ga", 31}, {"Ge", 32},
    {"As", 33}, {"Se", 34}, {"Br", 35}, {"Kr", 36}, {"Rb", 37}, {"Sr", 38},
    {"Zr", 40}, {"Mo", 42}, {"Ru", 44}, {"Rh", 45}, {"Pd", 46}, {"Ag", 47},
    {"Cd", 48}, {"In", 49}, {"Sn", 50}, {"Sb", 51}, {"Te", 52}, {"I", 53},
    {"Xe", 54}, {"Cs", 55}, {"Ba", 56}, {"W", 74},  {"Re", 75}, {"Os", 76},
    {"Ir", 77}, {"Pt", 78}, {"Au", 79}, {"Hg", 80}, {"Tl", 81}, {"Pb", 82},
    {"Bi", 83},
};

int symbol_to_number(const std::string& sym) {
  for (const auto& e : kElements) {
    if (sym == e.symbol) return e.number;
  }
  return -1;
}

const char* number_to_symbol(int z) {
  for (const auto& e : kElements) {
    if (z == e.number) return e.symbol;
  }
  return "?";
}

// Allowed valences for implicit-H computation on organic-subset atoms.
// (OpenSMILES: B 3; C 4; N 3,5; O 2; P 3,5; S 2,4,6; halogens 1.)
std::vector<int> organic_valences(int z) {
  switch (z) {
    case 5: return {3};
    case 6: return {4};
    // OpenSMILES lists N valences {3, 5}, but RDKit (the reference's
    // chemistry) rejects neutral hypervalent N ("Explicit valence ... is
    // greater than permitted") — uncharged pentavalent nitro/nitrile-adduct
    // SMILES must be written in charged form. Match RDKit.
    case 7: return {3};
    case 8: return {2};
    case 15: return {3, 5};
    case 16: return {2, 4, 6};
    case 9: case 17: case 35: case 53: return {1};
    default: return {};
  }
}

bool is_organic_subset(int z) {
  switch (z) {
    case 5: case 6: case 7: case 8: case 9: case 15: case 16:
    case 17: case 35: case 53:
      return true;
    default:
      return false;
  }
}

bool can_be_aromatic(int z) {
  switch (z) {
    case 5: case 6: case 7: case 8: case 15: case 16: case 33: case 34:
      return true;
    default:
      return false;
  }
}

// ---------------------------------------------------------------------------
// Molecular graph
// ---------------------------------------------------------------------------

enum BondOrder : uint8_t { BOND_SINGLE = 1, BOND_DOUBLE = 2, BOND_TRIPLE = 3, BOND_AROMATIC = 4 };
enum Chirality : uint8_t { CHI_NONE = 0, CHI_CCW = 1, CHI_CW = 2 };  // @ / @@

struct Atom {
  int z = 6;
  bool aromatic = false;
  int charge = 0;
  int isotope = 0;             // 0 = natural
  int explicit_h = -1;         // -1 = not bracketed (implicit by valence)
  Chirality chirality = CHI_NONE;
  bool bracket = false;
  int n_h = 0;                 // resolved H count
  std::vector<int> bonds;      // bond indices in written order
  bool h_first = false;        // bracket H counts as first neighbor for stereo
};

struct Bond {
  int a = -1, b = -1;
  BondOrder order = BOND_SINGLE;
  bool in_aromatic_ring = false;
  // Directional single-bond mark as written a->b: +1 '/', -1 '\', 0 none.
  // Consumed by perceive_bond_stereo and cleared afterwards.
  int8_t dir = 0;
  // Perceived double-bond stereo: s(ref_a) * s(ref_b) where s(n) is the
  // side (+1/-1) of reference neighbor n relative to the double-bond axis.
  // 0 = no stereo. refs are neighbor atom indices at ends a and b.
  int8_t stereo = 0;
  int stereo_ref_a = -1, stereo_ref_b = -1;
  // Stereo-unit END atoms when they differ from the bond endpoints: an odd
  // cumulated chain (butatriene and longer odd systems) is planar, so its
  // cis/trans unit spans the chain TERMINI; the perceived stereo is stored
  // on one representative chain bond with the termini recorded here. -1
  // (the default) means the unit ends are the bond's own endpoints.
  int stereo_end_a = -1, stereo_end_b = -1;

  int end_a() const { return stereo_end_a >= 0 ? stereo_end_a : a; }
  int end_b() const { return stereo_end_b >= 0 ? stereo_end_b : b; }

  int other(int atom) const { return atom == a ? b : a; }
};

struct Mol {
  std::vector<Atom> atoms;
  std::vector<Bond> bonds;

  int add_bond(int a, int b, BondOrder order) {
    Bond bond;
    bond.a = a;
    bond.b = b;
    bond.order = order;
    bonds.push_back(bond);
    int idx = static_cast<int>(bonds.size()) - 1;
    atoms[a].bonds.push_back(idx);
    atoms[b].bonds.push_back(idx);
    return idx;
  }
};

// ---------------------------------------------------------------------------
// Parser
// ---------------------------------------------------------------------------

struct RingBond {
  int atom = -1;
  int bond_symbol = 0;  // 0 = unspecified
};

class Parser {
 public:
  explicit Parser(const std::string& s) : s_(s) {}

  bool parse(Mol* mol) {
    mol_ = mol;
    size_t i = 0;
    std::vector<int> stack;
    int prev = -1;
    int pending_bond = 0;  // 0 unspecified, otherwise bond char

    while (i < s_.size()) {
      char c = s_[i];
      if (c == '(') {
        if (prev < 0) return false;
        stack.push_back(prev);
        ++i;
      } else if (c == ')') {
        if (stack.empty() || pending_bond) return false;
        prev = stack.back();
        stack.pop_back();
        ++i;
      } else if (c == '-' || c == '=' || c == '#' || c == ':' || c == '/' ||
                 c == '\\' || c == '~' || c == '$') {
        if (pending_bond) return false;  // two bond symbols in a row
        pending_bond = c;
        ++i;
      } else if (c == '.') {
        if (pending_bond) return false;  // bond symbol before a dot
        prev = -1;
        ++i;
      } else if (c == '%' || (c >= '0' && c <= '9')) {
        int ring;
        if (c == '%') {
          if (i + 2 >= s_.size() || !isdigit(s_[i + 1]) || !isdigit(s_[i + 2])) return false;
          ring = (s_[i + 1] - '0') * 10 + (s_[i + 2] - '0');
          i += 3;
        } else {
          ring = c - '0';
          ++i;
        }
        if (prev < 0) return false;
        if (!close_or_open_ring(prev, ring, pending_bond)) return false;
        pending_bond = 0;
      } else {
        int atom_idx = parse_atom(i);
        if (atom_idx < 0) return false;
        if (prev < 0 && pending_bond) return false;  // leading bond symbol
        if (prev >= 0) {
          BondOrder order = resolve_bond(pending_bond, prev, atom_idx);
          mol_->add_bond(prev, atom_idx, order);
          if (pending_bond == '/' || pending_bond == '\\') {
            mol_->bonds.back().dir = pending_bond == '/' ? 1 : -1;
          }
        }
        prev = atom_idx;
        pending_bond = 0;
      }
    }
    if (!stack.empty()) return false;
    if (pending_bond) return false;  // dangling bond symbol at end
    for (const auto& rb : open_rings_) {
      if (rb.second.atom >= 0) return false;  // unclosed ring bond
    }
    return mol_->atoms.size() > 0;
  }

 private:
  BondOrder resolve_bond(int sym, int a, int b) {
    switch (sym) {
      case '=': return BOND_DOUBLE;
      case '#': return BOND_TRIPLE;
      case ':': return BOND_AROMATIC;
      case '-': case '/': case '\\': return BOND_SINGLE;
      case 0:
        return (mol_->atoms[a].aromatic && mol_->atoms[b].aromatic) ? BOND_AROMATIC
                                                                    : BOND_SINGLE;
      default: return BOND_SINGLE;
    }
  }

  bool close_or_open_ring(int atom, int ring, int bond_sym) {
    auto it = open_rings_.find(ring);
    if (it == open_rings_.end() || it->second.atom < 0) {
      RingBond rb;
      rb.atom = atom;
      rb.bond_symbol = bond_sym;
      open_rings_[ring] = rb;
      // Ring-closure placeholder keeps stereo neighbor order consistent.
      ring_placeholder_[ring] = {atom, static_cast<int>(mol_->atoms[atom].bonds.size())};
      mol_->atoms[atom].bonds.push_back(-1000 - ring);
      return true;
    }
    RingBond rb = it->second;
    open_rings_.erase(it);
    if (rb.atom == atom) return false;
    // Reject a ring closure that duplicates an existing bond between the
    // same pair of atoms (e.g. C1(C1), C12CC12) — parallel bonds are not
    // a molecule. Placeholder slots (< 0) are skipped.
    for (int bi : mol_->atoms[atom].bonds) {
      if (bi >= 0 &&
          (mol_->bonds[bi].a == rb.atom || mol_->bonds[bi].b == rb.atom)) {
        return false;
      }
    }
    bool dir_pair = (bond_sym == '/' || bond_sym == '\\') &&
                    (rb.bond_symbol == '/' || rb.bond_symbol == '\\');
    if (bond_sym && rb.bond_symbol && bond_sym != rb.bond_symbol && !dir_pair) {
      return false;  // conflicting bond orders on the two closure sides
    }
    int sym = bond_sym ? bond_sym : rb.bond_symbol;
    BondOrder order = resolve_bond(sym, rb.atom, atom);
    // Create the bond and patch the placeholder slot on the opening atom.
    Bond bond;
    bond.a = rb.atom;
    bond.b = atom;
    bond.order = order;
    // Directional ring-closure bonds: the mark before a digit points from
    // the atom carrying the digit toward the ring partner. Opening-side
    // marks are already a->b; closing-side marks are b->a (flip). Both
    // present must agree.
    int dir_open = rb.bond_symbol == '/' ? 1 : rb.bond_symbol == '\\' ? -1 : 0;
    int dir_close = bond_sym == '/' ? -1 : bond_sym == '\\' ? 1 : 0;
    if (dir_open && dir_close && dir_open != dir_close) return false;
    bond.dir = static_cast<int8_t>(dir_open ? dir_open : dir_close);
    mol_->bonds.push_back(bond);
    int idx = static_cast<int>(mol_->bonds.size()) - 1;
    auto ph = ring_placeholder_[ring];
    mol_->atoms[ph.first].bonds[ph.second] = idx;
    mol_->atoms[atom].bonds.push_back(idx);
    return true;
  }

  int parse_atom(size_t& i) {
    char c = s_[i];
    Atom atom;
    if (c == '[') {
      size_t end = s_.find(']', i);
      if (end == std::string::npos) return -1;
      std::string body = s_.substr(i + 1, end - i - 1);
      i = end + 1;
      if (!parse_bracket(body, &atom)) return -1;
    } else if (c == 'C' && i + 1 < s_.size() && s_[i + 1] == 'l') {
      atom.z = 17; i += 2;
    } else if (c == 'B' && i + 1 < s_.size() && s_[i + 1] == 'r') {
      atom.z = 35; i += 2;
    } else if (c == 'B' || c == 'C' || c == 'N' || c == 'O' || c == 'P' ||
               c == 'S' || c == 'F' || c == 'I') {
      atom.z = symbol_to_number(std::string(1, c));
      ++i;
    } else if (c == 'b' || c == 'c' || c == 'n' || c == 'o' || c == 'p' || c == 's') {
      atom.z = symbol_to_number(std::string(1, static_cast<char>(toupper(c))));
      atom.aromatic = true;
      ++i;
    } else if (c == '*') {
      atom.z = 0;  // wildcard
      ++i;
    } else {
      return -1;
    }
    mol_->atoms.push_back(atom);
    return static_cast<int>(mol_->atoms.size()) - 1;
  }

  bool parse_bracket(const std::string& body, Atom* atom) {
    size_t j = 0;
    atom->bracket = true;
    // isotope
    while (j < body.size() && isdigit(body[j])) {
      atom->isotope = atom->isotope * 10 + (body[j] - '0');
      ++j;
    }
    if (j >= body.size()) return false;
    // element symbol (possibly aromatic lowercase)
    if (islower(body[j]) && body[j] != 'h') {
      std::string sym;
      sym += static_cast<char>(toupper(body[j]));
      if (j + 1 < body.size() && islower(body[j + 1]) &&
          symbol_to_number(sym + body[j + 1]) > 0 &&
          (sym + body[j + 1] == "Se" || sym + body[j + 1] == "As")) {
        sym += body[j + 1];
        ++j;
      }
      int z = symbol_to_number(sym);
      if (z < 0) return false;
      atom->z = z;
      atom->aromatic = true;
      ++j;
    } else if (isupper(body[j])) {
      std::string sym(1, body[j]);
      if (j + 1 < body.size() && islower(body[j + 1]) && body[j + 1] != 'h') {
        std::string two = sym + body[j + 1];
        if (symbol_to_number(two) > 0) {
          sym = two;
          ++j;
        }
      }
      int z = symbol_to_number(sym);
      if (z < 0) return false;
      atom->z = z;
      ++j;
    } else if (body[j] == '*') {
      atom->z = 0;
      ++j;
    } else {
      return false;
    }
    atom->explicit_h = 0;
    // chirality
    if (j < body.size() && body[j] == '@') {
      if (j + 1 < body.size() && body[j + 1] == '@') {
        atom->chirality = CHI_CW;
        j += 2;
      } else {
        atom->chirality = CHI_CCW;
        ++j;
        // @TH1 etc. — skip alphanumeric class markers
        while (j < body.size() && isupper(body[j]) && body[j] != 'H') ++j;
      }
    }
    // hydrogens
    if (j < body.size() && body[j] == 'H') {
      ++j;
      int h = 1;
      if (j < body.size() && isdigit(body[j])) {
        h = 0;
        while (j < body.size() && isdigit(body[j])) {
          h = h * 10 + (body[j] - '0');
          ++j;
        }
      }
      atom->explicit_h = h;
    }
    // charge
    while (j < body.size() && (body[j] == '+' || body[j] == '-')) {
      int sign = body[j] == '+' ? 1 : -1;
      ++j;
      if (j < body.size() && isdigit(body[j])) {
        int mag = 0;
        while (j < body.size() && isdigit(body[j])) {
          mag = mag * 10 + (body[j] - '0');
          ++j;
        }
        atom->charge += sign * mag;
      } else {
        atom->charge += sign;
        while (j < body.size() && body[j] == (sign > 0 ? '+' : '-')) {
          atom->charge += sign;
          ++j;
        }
      }
    }
    // atom map (":n") — parsed, ignored
    if (j < body.size() && body[j] == ':') {
      ++j;
      while (j < body.size() && isdigit(body[j])) ++j;
    }
    return j == body.size();
  }

  const std::string& s_;
  Mol* mol_ = nullptr;
  std::map<int, RingBond> open_rings_;
  std::map<int, std::pair<int, int>> ring_placeholder_;
};

// ---------------------------------------------------------------------------
// Sanitization: implicit H, valence checks, aromaticity
// ---------------------------------------------------------------------------

int bond_order_int(BondOrder o) {
  switch (o) {
    case BOND_SINGLE: return 1;
    case BOND_DOUBLE: return 2;
    case BOND_TRIPLE: return 3;
    case BOND_AROMATIC: return 1;  // handled specially for aromatic atoms
  }
  return 1;
}

// Ring perception: smallest rings through each ring bond (bounded BFS).
std::vector<std::vector<int>> find_rings(const Mol& mol, int max_size = 8) {
  std::vector<std::vector<int>> rings;
  std::set<std::vector<int>> seen;
  int n = static_cast<int>(mol.atoms.size());
  for (int bi = 0; bi < static_cast<int>(mol.bonds.size()); ++bi) {
    const Bond& bond = mol.bonds[bi];
    // BFS from bond.a to bond.b avoiding the bond itself.
    std::vector<int> parent(n, -2), parent_bond(n, -1);
    std::vector<int> queue;
    queue.push_back(bond.a);
    parent[bond.a] = -1;
    bool found = false;
    for (size_t qi = 0; qi < queue.size() && !found; ++qi) {
      int u = queue[qi];
      for (int nb : mol.atoms[u].bonds) {
        if (nb == bi || nb < 0) continue;
        int v = mol.bonds[nb].other(u);
        if (parent[v] != -2) continue;
        parent[v] = u;
        parent_bond[v] = nb;
        if (v == bond.b) {
          found = true;
          break;
        }
        queue.push_back(v);
      }
    }
    if (!found) continue;
    std::vector<int> ring;
    int cur = bond.b;
    while (cur != -1) {
      ring.push_back(cur);
      cur = parent[cur];
    }
    if (static_cast<int>(ring.size()) > max_size) continue;
    std::vector<int> key = ring;
    std::sort(key.begin(), key.end());
    if (seen.insert(key).second) rings.push_back(ring);
  }
  return rings;
}

// Pi-electron contribution of atom `a` within candidate aromatic ring.
// Returns -1 if the atom disqualifies the ring.
int pi_contribution(const Mol& mol, int a, const std::set<int>& ring_atoms) {
  const Atom& atom = mol.atoms[a];
  if (!can_be_aromatic(atom.z)) return -1;
  int n_double_in_ring = 0, n_double_exo = 0, n_triple = 0;
  for (int bidx : atom.bonds) {
    if (bidx < 0) continue;
    const Bond& b = mol.bonds[bidx];
    if (b.order == BOND_TRIPLE) ++n_triple;
    if (b.order == BOND_DOUBLE || b.order == BOND_AROMATIC) {
      bool other_in_ring = ring_atoms.count(b.other(a)) > 0;
      if (b.order == BOND_DOUBLE) {
        if (other_in_ring) ++n_double_in_ring;
        else ++n_double_exo;
      } else if (other_in_ring) {
        ++n_double_in_ring;  // aromatic bond inside ring: treat as shared pi
      }
    }
  }
  if (n_triple > 0) return -1;
  int degree = 0;
  for (int bidx : atom.bonds) {
    if (bidx >= 0) degree++;
  }
  int total_conn = degree + atom.n_h;
  if (total_conn > 3) return -1;  // sp3
  if (n_double_in_ring > 0) return 1;
  if (n_double_exo > 0) {
    // Exocyclic double bond: carbon contributes 0 (quinoid), N+ similar.
    return 0;
  }
  // No double bonds: contributes lone pair if available.
  switch (atom.z) {
    case 7: case 15: return 2;                       // pyrrole-type N/P
    case 8: case 16: case 34: return 2;              // furan O / thiophene S
    case 6: return atom.charge < 0 ? 2 : (atom.charge > 0 ? 0 : -1);
    case 5: return 0;                                // empty p orbital
    default: return -1;
  }
}

void perceive_aromaticity(Mol* mol) {
  auto rings = find_rings(*mol, 7);
  std::vector<bool> ring_is_aromatic(rings.size(), false);

  // Pass 1: per-ring Hueckel test. Iterate since aromatic flags feed back
  // (aromatic-marked bonds count as in-ring doubles for fused systems).
  bool changed = true;
  int iter = 0;
  while (changed && iter++ < 4) {
    changed = false;
    for (size_t r = 0; r < rings.size(); ++r) {
      if (ring_is_aromatic[r]) continue;
      std::set<int> ring_atoms(rings[r].begin(), rings[r].end());
      int pi = 0;
      bool ok = true;
      for (int a : rings[r]) {
        int c = pi_contribution(*mol, a, ring_atoms);
        if (c < 0) {
          ok = false;
          break;
        }
        pi += c;
      }
      if (ok && pi >= 2 && (pi - 2) % 4 == 0) {
        ring_is_aromatic[r] = true;
        changed = true;
        for (int a : rings[r]) mol->atoms[a].aromatic = true;
        for (int a : rings[r]) {
          for (int bidx : mol->atoms[a].bonds) {
            if (bidx < 0) continue;
            Bond& b = mol->bonds[bidx];
            if (ring_atoms.count(b.a) && ring_atoms.count(b.b)) {
              b.order = BOND_AROMATIC;
              b.in_aromatic_ring = true;
            }
          }
        }
      }
    }
  }
}

// Kekulization over aromatic subgraph (validity check for aromatic input).
// Atoms that "need" a double bond must be perfectly matched through aromatic
// bonds. Backtracking; molecule sizes here are small.
bool kekulize_check(const Mol& mol) {
  int n = static_cast<int>(mol.atoms.size());
  std::vector<int> needs(n, 0);
  std::vector<std::vector<int>> adj(n);
  bool any = false;
  for (int a = 0; a < n; ++a) {
    const Atom& atom = mol.atoms[a];
    if (!atom.aromatic) continue;
    any = true;
    // Does this atom need one double bond in a kekule structure?
    int sum_fixed = atom.n_h;
    int n_arom = 0;
    for (int bidx : atom.bonds) {
      if (bidx < 0) continue;
      const Bond& b = mol.bonds[bidx];
      if (b.order == BOND_AROMATIC) {
        ++n_arom;
        ++sum_fixed;
      } else {
        sum_fixed += bond_order_int(b.order);
      }
    }
    int target_valence;
    switch (atom.z) {
      case 6: target_valence = 4 + (atom.charge < 0 ? -1 : atom.charge > 0 ? -1 : 0); break;
      case 7: case 15: target_valence = 3 + (atom.charge > 0 ? 1 : atom.charge < 0 ? -1 : 0); break;
      case 8: case 16: case 34: target_valence = 2 + (atom.charge > 0 ? 1 : 0); break;
      case 5: target_valence = 3; break;
      default: target_valence = sum_fixed;  // permissive
    }
    needs[a] = (sum_fixed < target_valence) ? 1 : 0;
    for (int bidx : atom.bonds) {
      if (bidx < 0) continue;
      const Bond& b = mol.bonds[bidx];
      if (b.order == BOND_AROMATIC) adj[a].push_back(b.other(a));
    }
  }
  if (!any) return true;
  // Greedy + backtracking perfect matching on atoms with needs==1.
  std::vector<int> match(n, -1);
  std::vector<char> visited(n, 0);

  std::function<bool(int)> try_match = [&](int u) -> bool {
    for (int v : adj[u]) {
      if (needs[v] != 1 || visited[v]) continue;
      visited[v] = 1;
      if (match[v] == -1 || try_match(match[v])) {
        match[v] = u;
        match[u] = v;
        return true;
      }
    }
    return false;
  };

  for (int u = 0; u < n; ++u) {
    if (needs[u] == 1 && match[u] == -1) {
      std::fill(visited.begin(), visited.end(), 0);
      visited[u] = 1;
      if (!try_match(u)) return false;
    }
  }
  return true;
}

// Perceive double-bond (E/Z) stereo from directional single-bond marks.
//
// A directional bond written x->y with '/' places y "up" relative to x.
// side(d, x) gives the side (+1 up / -1 down) of d's far atom as seen from
// endpoint x. A double bond gets stereo when BOTH ends carry at least one
// directional single bond: stereo = side(ref_a) * side(ref_b) with one
// reference neighbor fixed per end (+1 = same side / cis of the refs,
// -1 = opposite / trans). Conflicting marks (two same-side neighbors of one
// end marked identically) invalidate the molecule, like RDKit. Directions
// are cleared afterwards; writers re-derive them from the stereo field.
// Is atom x an interior sp center of a cumulated chain: a non-aromatic
// carbon whose only two bonds are both double?
static bool cumulene_sp_center(const Mol& mol, int x) {
  const Atom& a = mol.atoms[x];
  if (a.z != 6 || a.aromatic || a.bonds.size() != 2) return false;
  for (int bidx : a.bonds) {
    const Bond& b = mol.bonds[bidx];
    if (b.order != BOND_DOUBLE || b.in_aromatic_ring) return false;
  }
  return true;
}

// Maximal cumulated chain through double bond `bi`: ordered bond list plus
// the two terminal (non-sp) atoms. Returns false for a fully cumulated
// CYCLE (no termini; fuzz inputs like C1=C=C=1), whose bonds are still
// appended to `chain` so the caller can mark them visited.
static bool cumulene_chain(const Mol& mol, int bi, std::vector<int>* chain,
                           int* end_a, int* end_b) {
  chain->assign(1, bi);
  int ends[2] = {mol.bonds[bi].a, mol.bonds[bi].b};
  for (int e = 0; e < 2; ++e) {
    int cur_bond = bi;
    int x = ends[e];
    while (cumulene_sp_center(mol, x)) {
      const Atom& ax = mol.atoms[x];
      int next_bond = ax.bonds[0] == cur_bond ? ax.bonds[1] : ax.bonds[0];
      if (next_bond == bi) return false;  // cumulated cycle closed
      chain->push_back(next_bond);
      cur_bond = next_bond;
      x = mol.bonds[next_bond].other(x);
    }
    ends[e] = x;
  }
  *end_a = ends[0];
  *end_b = ends[1];
  return true;
}

bool perceive_bond_stereo(Mol* mol) {
  auto side = [&](const Bond& d, int x) {
    return d.a == x ? static_cast<int>(d.dir) : -static_cast<int>(d.dir);
  };
  std::vector<char> seen(mol->bonds.size(), 0);
  for (size_t bi = 0; bi < mol->bonds.size(); ++bi) {
    if (seen[bi]) continue;
    const Bond& first = mol->bonds[bi];
    if (first.order != BOND_DOUBLE || first.in_aromatic_ring) continue;
    if (mol->atoms[first.a].aromatic || mol->atoms[first.b].aromatic) continue;
    // Group the whole cumulated chain (k = 1 is the plain alkene case).
    std::vector<int> chain;
    int ends[2] = {-1, -1};
    bool open = cumulene_chain(*mol, static_cast<int>(bi), &chain,
                               &ends[0], &ends[1]);
    for (int cb : chain) seen[cb] = 1;
    const size_t k = chain.size();
    if (!open) continue;          // cumulated cycle: no termini
    // Even chains are axial units: k=2 (allene) is handled by
    // perceive_axial_stereo; longer even chains are out of scope.
    // Odd chains are planar cis/trans units spanning the termini; support
    // is limited to all-carbon termini (hetero termini out of scope,
    // matching the heterocumulene policy for axial marks).
    if (k % 2 == 0) continue;
    if (k >= 3 && (mol->atoms[ends[0]].z != 6 || mol->atoms[ends[1]].z != 6))
      continue;
    int refs[2] = {-1, -1};
    int sides[2] = {0, 0};
    bool conflict = false;
    for (int e = 0; e < 2; ++e) {
      int x = ends[e];
      for (int bidx : mol->atoms[x].bonds) {
        const Bond& d = mol->bonds[bidx];
        if (d.order != BOND_SINGLE || d.dir == 0) continue;
        if (d.a != x && d.b != x) continue;
        int n = d.other(x);
        int s = side(d, x);
        if (refs[e] < 0) {
          refs[e] = n;
          sides[e] = s;
        } else if (s == sides[e]) {
          conflict = true;  // two neighbors of one end on the same side
        }
      }
    }
    if (conflict) return false;
    if (refs[0] >= 0 && refs[1] >= 0) {
      // Store on the lowest-index chain bond; record termini when the unit
      // spans more than one bond.
      Bond& sb = mol->bonds[*std::min_element(chain.begin(), chain.end())];
      sb.stereo = static_cast<int8_t>(sides[0] * sides[1]);
      sb.stereo_ref_a = refs[0];
      sb.stereo_ref_b = refs[1];
      if (k > 1) {
        sb.stereo_end_a = ends[0];
        sb.stereo_end_b = ends[1];
      }
    }
  }
  for (auto& b : mol->bonds) b.dir = 0;
  return true;
}

// ---------------------------------------------------------------------------
// Axial (allene) stereo.
//
// An even-length cumulated system C=C=C holds its two terminal substituent
// planes perpendicular: with distinguishable substituents on both termini
// the molecule is axially chiral (RDKit's new stereo perception calls this
// ST_Atom_Allene; reference canonicalization flows through RDKit in
// utils.py:22-41). The accepted and emitted notation is OpenSMILES extended
// tetrahedral: @/@@ on the central sp carbon (NC(Br)=[C@]=C(O)C). The
// parity convention mirrors the engine's tetrahedral one: the descriptor is
// read against the HEAVY substituents of the two termini in written order
// (first-written terminal's substituents first); implicit hydrogens never
// enter the permutation. perceive_axial_stereo normalizes the parsed mark
// to the sorted-by-atom-index reference order; the writer re-derives the
// emitted mark from that reference, so the sorted intermediate cancels and
// the emitted mark depends only on written-vs-emitted substituent order.
// Directional-bond marks across an allene (C/C=C=C/C) are not valid allene
// stereo in OpenSMILES and are cleared by perceive_bond_stereo like any
// unconsumed mark; longer even cumulenes and heterocumulene termini are out
// of scope and their central marks are cleared by the stereo cleaner.

// Permutation parity between two orderings of the same distinct tokens
// (shared by the tetrahedral writer path and the axial normalization).
int permutation_parity(const std::vector<int>& from, const std::vector<int>& to) {
  std::vector<int> perm;
  for (int t : to) {
    auto it = std::find(from.begin(), from.end(), t);
    perm.push_back(static_cast<int>(it - from.begin()));
  }
  int parity = 0;
  std::vector<int> p = perm;
  for (size_t i = 0; i < p.size(); ++i) {
    while (p[i] != static_cast<int>(i)) {
      std::swap(p[i], p[p[i]]);
      parity ^= 1;
    }
  }
  return parity;
}

// Constitution test: is x the center of a supported allene stereo unit
// (neutral sp carbon, two double bonds to distinct non-cumulated neutral
// carbon termini, each with exactly two substituent slots)?
bool axial_termini(const Mol& mol, int x, int* ta, int* tb) {
  const Atom& a = mol.atoms[x];
  if (a.z != 6 || a.aromatic || a.charge != 0 || a.n_h != 0) return false;
  if (a.bonds.size() != 2) return false;
  const Bond& b0 = mol.bonds[a.bonds[0]];
  const Bond& b1 = mol.bonds[a.bonds[1]];
  if (b0.order != BOND_DOUBLE || b1.order != BOND_DOUBLE) return false;
  const int t0 = b0.other(x), t1 = b1.other(x);
  if (t0 == t1) return false;
  for (int t : {t0, t1}) {
    const Atom& term = mol.atoms[t];
    if (term.z != 6 || term.aromatic || term.charge != 0) return false;
    int n_double = 0;
    for (int bidx : term.bonds) {
      const BondOrder o = mol.bonds[bidx].order;
      if (o == BOND_DOUBLE) ++n_double;
      if (o == BOND_TRIPLE || o == BOND_AROMATIC) return false;
    }
    if (n_double != 1) return false;  // further cumulation: unsupported
    if (static_cast<int>(term.bonds.size()) - 1 + term.n_h != 2) return false;
  }
  *ta = t0;
  *tb = t1;
  return true;
}

// Substituents of allene terminal t (excluding the center x) in the order
// they were written around t, heavy atoms first, then implicit hydrogens as
// virtual tokens -(2t+2), -(2t+3). The fixed H-last slot makes the parity
// independent of where a rendering textually places the hydrogen — the same
// convention class as the tetrahedral writer's heavy-only permutation (both
// deviate from spec only in which enantiomer LABEL an external rendering
// maps to, never in distinctness or self-consistency).
std::vector<int> axial_subs(const Mol& mol, int x, int t) {
  std::vector<int> out;
  for (int bidx : mol.atoms[t].bonds) {
    const int v = mol.bonds[bidx].other(t);
    if (v != x) out.push_back(v);
  }
  for (int h = 0; h < mol.atoms[t].n_h; ++h) out.push_back(-(2 * t + 2 + h));
  return out;
}

// Normalize parsed axial marks to the sorted-substituent reference order.
// Marks on 2-coordinate atoms that are NOT supported axial centers are left
// for drop_uninformative_stereo to clear.
void perceive_axial_stereo(Mol* mol) {
  for (size_t x = 0; x < mol->atoms.size(); ++x) {
    Atom& a = mol->atoms[x];
    if (a.chirality == CHI_NONE || a.bonds.size() != 2) continue;
    int ta = -1, tb = -1;
    if (!axial_termini(*mol, static_cast<int>(x), &ta, &tb)) continue;
    std::vector<int> written = axial_subs(*mol, static_cast<int>(x), ta);
    for (int v : axial_subs(*mol, static_cast<int>(x), tb)) {
      written.push_back(v);
    }
    std::vector<int> ref = written;
    std::sort(ref.begin(), ref.end());
    if (permutation_parity(written, ref)) {
      a.chirality = (a.chirality == CHI_CW) ? CHI_CCW : CHI_CW;
    }
  }
}

// Resolve implicit hydrogens & validate valences. Returns false on invalid.
// Fold explicit neutral hydrogens into their heavy neighbor's implicit
// count (RDKit MolFromSmiles removeHs parity): without this, C([H])O and
// CO canonicalize to different strings for the same molecule, deflating
// exact-match Top-N against targets written the other way. Folds only
// plain [H]: isotopes ([2H]), charges ([H+]/[H-]), H-H bonds, bridging or
// lone H, and H carrying stereo all keep their explicit node, like RDKit.
//
// Three invariants are preserved:
//  * chirality — the folded H moves from its written neighbor slot k to
//    the implicit-H slot (right after the preceding atom, or first when
//    the atom has none); an odd slot distance flips the mark, making the
//    folded state identical to parsing the equivalent bracket-H string;
//  * E/Z — a directional mark riding the H bond transfers to the end's
//    other unmarked single bond with the opposite side (RDKit RemoveHs
//    does the same), so [H]/C(C)=C/F keeps its stereo;
//  * valence — folded H per atom is recorded in *min_h and checked
//    against the resolved implicit count, so C([H])([H])([H])([H])[H]
//    stays invalid instead of silently losing a hydrogen.
void fold_explicit_hydrogens(Mol* mol, std::vector<int>* min_h) {
  const int n = static_cast<int>(mol->atoms.size());
  std::vector<bool> drop_atom(n, false);
  std::vector<bool> drop_bond(mol->bonds.size(), false);
  std::vector<int> folded(n, 0);
  bool any = false;

  for (int i = 0; i < n; ++i) {
    Atom& h = mol->atoms[i];
    if (h.z != 1 || h.isotope != 0 || h.charge != 0 || h.aromatic ||
        h.chirality != CHI_NONE || h.explicit_h > 0) {
      continue;
    }
    if (h.bonds.size() != 1) continue;     // lone [H] or bridging H
    const int bidx = h.bonds[0];
    Bond& bond = mol->bonds[bidx];
    if (bond.order != BOND_SINGLE) continue;
    const int nb = bond.other(i);
    Atom& heavy = mol->atoms[nb];
    if (heavy.z <= 1) continue;            // [H][H]

    // E/Z direction transfer (only meaningful next to a double bond).
    if (bond.dir != 0) {
      bool near_double = false;
      for (int eb : heavy.bonds) {
        near_double |= (mol->bonds[eb].order == BOND_DOUBLE);
      }
      if (near_double) {
        const int side_h = (bond.a == nb) ? bond.dir : -bond.dir;
        for (int eb : heavy.bonds) {
          Bond& e = mol->bonds[eb];
          if (eb == bidx || e.order != BOND_SINGLE || e.dir != 0) continue;
          if (drop_bond[eb]) continue;
          e.dir = static_cast<int8_t>((e.a == nb) ? -side_h : side_h);
          break;
        }
      }
    }

    // Chirality: written slot k -> the implicit-H slot j.
    if (heavy.chirality != CHI_NONE) {
      int k = 0;
      for (size_t t = 0; t < heavy.bonds.size(); ++t) {
        if (heavy.bonds[t] == bidx) k = static_cast<int>(t);
      }
      bool has_prev = false;
      for (int eb : heavy.bonds) {
        if (eb == bidx || drop_bond[eb]) continue;
        if (mol->bonds[eb].other(nb) < nb) has_prev = true;
      }
      const int j = has_prev ? 1 : 0;
      if (((k - j) & 1) != 0) {
        heavy.chirality = (heavy.chirality == CHI_CW) ? CHI_CCW : CHI_CW;
      }
    }

    if (heavy.explicit_h >= 0) {
      heavy.explicit_h += 1;               // bracket atom: count is explicit
    } else if (heavy.aromatic) {
      // Aromatic defaults can't absorb an extra H (n([H]) is pyrrole-type);
      // pin the count as if written in the bracket.
      heavy.explicit_h = 1;
    }
    folded[nb] += 1;
    drop_atom[i] = true;
    drop_bond[bidx] = true;
    any = true;
  }
  if (!any) {
    min_h->assign(n, 0);
    return;
  }

  // Compact atoms and bonds, remapping indices; written order preserved.
  std::vector<int> atom_map(n, -1), bond_map(mol->bonds.size(), -1);
  Mol compact;
  min_h->clear();
  for (int i = 0; i < n; ++i) {
    if (drop_atom[i]) continue;
    atom_map[i] = static_cast<int>(compact.atoms.size());
    Atom a = mol->atoms[i];
    a.bonds.clear();
    compact.atoms.push_back(a);
    min_h->push_back(folded[i]);
  }
  for (size_t b = 0; b < mol->bonds.size(); ++b) {
    if (drop_bond[b]) continue;
    bond_map[b] = static_cast<int>(compact.bonds.size());
    Bond e = mol->bonds[b];
    e.a = atom_map[e.a];
    e.b = atom_map[e.b];
    compact.bonds.push_back(e);
  }
  for (int i = 0; i < n; ++i) {
    if (drop_atom[i]) continue;
    for (int eb : mol->atoms[i].bonds) {
      if (eb >= 0 && !drop_bond[eb]) {
        compact.atoms[atom_map[i]].bonds.push_back(bond_map[eb]);
      }
    }
  }
  *mol = std::move(compact);
}

bool sanitize(Mol* mol) {
  // First pass for non-aromatic-perception-dependent H counts so that
  // aromaticity perception sees correct connectivity.
  for (size_t i = 0; i < mol->atoms.size(); ++i) {
    Atom& atom = mol->atoms[i];
    // Drop unresolved ring placeholders (parser already errors on those).
    std::vector<int> clean;
    for (int b : atom.bonds) {
      if (b >= 0) clean.push_back(b);
    }
    atom.bonds = clean;
  }
  std::vector<int> min_h;
  fold_explicit_hydrogens(mol, &min_h);
  for (size_t i = 0; i < mol->atoms.size(); ++i) {
    Atom& atom = mol->atoms[i];
    if (atom.explicit_h >= 0) {
      atom.n_h = atom.explicit_h;
      continue;
    }
    if (!is_organic_subset(atom.z)) {
      if (atom.z == 0) { atom.n_h = 0; continue; }
      atom.n_h = 0;
      continue;
    }
    if (atom.aromatic) {
      int degree = static_cast<int>(atom.bonds.size());
      if (atom.z == 6) {
        atom.n_h = degree <= 2 ? 1 : 0;
      } else if (atom.z == 5) {
        atom.n_h = degree <= 2 ? 1 : 0;
      } else {
        atom.n_h = 0;  // pyridine-type n, o, s, p (pyrrole N must be [nH])
      }
      continue;
    }
    int bond_sum = 0;
    for (int bidx : atom.bonds) bond_sum += bond_order_int(mol->bonds[bidx].order);
    auto valences = organic_valences(atom.z);
    int n_h = 0;
    bool fits = false;
    for (int v : valences) {
      // Folded explicit hydrogens count toward the valence being selected
      // — S(C)(C)([H])[H] must pick sulfur's 6-valence like [SH2](C)C
      // does, and C([H])([H])([H])([H])[H] must stay invalid (no valence
      // fits 5 hydrogens), not silently become CH4.
      if (bond_sum + min_h[i] <= v) {
        n_h = v - bond_sum;
        fits = true;
        break;
      }
    }
    if (!fits) return false;  // hypervalent organic-subset atom => invalid
    atom.n_h = n_h;
  }

  perceive_aromaticity(mol);

  // Aromatic atoms written lowercase must belong to a ring.
  for (size_t i = 0; i < mol->atoms.size(); ++i) {
    const Atom& atom = mol->atoms[i];
    if (!atom.aromatic) continue;
    bool has_arom_bond = false;
    for (int bidx : atom.bonds) {
      if (mol->bonds[bidx].order == BOND_AROMATIC) has_arom_bond = true;
    }
    if (!has_arom_bond) return false;
  }

  if (!kekulize_check(*mol)) return false;
  if (!perceive_bond_stereo(mol)) return false;
  perceive_axial_stereo(mol);
  return true;
}

// ---------------------------------------------------------------------------
// Canonical ranking (WL refinement + branch-and-min)
// ---------------------------------------------------------------------------

std::vector<int> refine_ranks(const Mol& mol, std::vector<int64_t> keys) {
  int n = static_cast<int>(mol.atoms.size());
  std::vector<int> ranks(n, 0);
  // Initial ranks from invariant keys.
  {
    std::vector<int> order(n);
    for (int i = 0; i < n; ++i) order[i] = i;
    std::sort(order.begin(), order.end(),
              [&](int a, int b) { return keys[a] < keys[b]; });
    int rank = 0;
    for (int i = 0; i < n; ++i) {
      if (i > 0 && keys[order[i]] != keys[order[i - 1]]) ++rank;
      ranks[order[i]] = rank;
    }
  }
  // Iterative refinement with neighbor multisets.
  for (int iter = 0; iter < n + 2; ++iter) {
    std::vector<std::pair<std::vector<int64_t>, int>> sigs(n);
    for (int i = 0; i < n; ++i) {
      std::vector<int64_t> nb;
      for (int bidx : mol.atoms[i].bonds) {
        const Bond& b = mol.bonds[bidx];
        nb.push_back(static_cast<int64_t>(ranks[b.other(i)]) * 8 + b.order);
      }
      std::sort(nb.begin(), nb.end());
      nb.insert(nb.begin(), ranks[i]);
      sigs[i] = {nb, i};
    }
    std::vector<int> order(n);
    for (int i = 0; i < n; ++i) order[i] = i;
    std::sort(order.begin(), order.end(), [&](int a, int b) { return sigs[a].first < sigs[b].first; });
    std::vector<int> new_ranks(n, 0);
    int rank = 0;
    for (int i = 0; i < n; ++i) {
      if (i > 0 && sigs[order[i]].first != sigs[order[i - 1]].first) ++rank;
      new_ranks[order[i]] = rank;
    }
    if (new_ranks == ranks) break;
    ranks = new_ranks;
  }
  return ranks;
}

std::vector<int64_t> initial_keys(const Mol& mol) {
  std::vector<int64_t> keys(mol.atoms.size());
  for (size_t i = 0; i < mol.atoms.size(); ++i) {
    const Atom& a = mol.atoms[i];
    int64_t k = 0;
    k = k * 128 + a.z;
    k = k * 2 + (a.aromatic ? 1 : 0);
    k = k * 16 + (a.charge + 8);
    k = k * 16 + std::min(a.n_h, 15);
    k = k * 16 + std::min<int>(static_cast<int>(a.bonds.size()), 15);
    k = k * 512 + std::min(a.isotope, 511);
    keys[i] = k;
  }
  return keys;
}

}  // namespace

// Canonical SMILES writer. Two passes: (1) DFS in canonical-rank order to
// discover tree edges and ring-closure bonds (assigning ring digits to BOTH
// endpoints), (2) string emission following the recorded structure.
namespace writer {

struct AtomPlan {
  int parent_bond = -1;
  std::vector<std::pair<int, int>> closures;   // (bond, digit), emission order
  std::vector<std::pair<int, int>> children;   // (bond, child atom)
};

struct WriteCtx {
  const Mol* mol;
  const std::vector<int>* ranks;
  std::vector<bool> visited;
  std::vector<AtomPlan> plan;
  std::map<std::pair<int, int>, int> ring_digit;  // sorted (a,b) -> digit
  int next_digit = 1;
  // Emission directions for single bonds adjacent to stereo double bonds,
  // as a->b (+1 '/', -1 '\'), derived from Bond::stereo by
  // assign_directions.
  std::vector<int8_t> bond_dir;
};

// Re-derive directional marks from perceived double-bond stereo.
//
// Constraint system over single-bond directions: (R1) the two single-bond
// neighbors of a stereo end sit on opposite sides; (R2) for each stereo
// double bond, side(ref_a) * side(ref_b) = stereo. Free systems are seeded
// deterministically from canonical ranks (lowest-rank end, lowest-rank
// neighbor = '/'), so equivalent inputs produce identical strings; a global
// slash flip is the only gauge freedom and the seed pins it.
void assign_directions(WriteCtx* ctx) {
  const Mol& mol = *ctx->mol;
  ctx->bond_dir.assign(mol.bonds.size(), 0);

  std::vector<int> stereo_bonds;
  for (size_t i = 0; i < mol.bonds.size(); ++i) {
    if (mol.bonds[i].stereo != 0) stereo_bonds.push_back(static_cast<int>(i));
  }
  if (stereo_bonds.empty()) return;
  const std::vector<int>& ranks = *ctx->ranks;
  std::sort(stereo_bonds.begin(), stereo_bonds.end(), [&](int x, int y) {
    const Bond& bx = mol.bonds[x];
    const Bond& by = mol.bonds[y];
    auto kx = std::minmax(ranks[bx.end_a()], ranks[bx.end_b()]);
    auto ky = std::minmax(ranks[by.end_a()], ranks[by.end_b()]);
    if (kx != ky) return kx < ky;
    return x < y;
  });

  // side of neighbor n at end x from the current assignment (0 = unknown)
  auto get_side = [&](int x, int n) -> int {
    for (int bidx : mol.atoms[x].bonds) {
      if (bidx < 0) continue;
      const Bond& d = mol.bonds[bidx];
      if (d.order != BOND_SINGLE || d.other(x) != n) continue;
      int dir = ctx->bond_dir[bidx];
      if (dir == 0) return 0;
      return d.a == x ? dir : -dir;
    }
    return 0;
  };
  // single-bond neighbors of a stereo end
  auto single_nbrs = [&](int x, int skip_bond) {
    std::vector<int> out;
    for (int bidx : mol.atoms[x].bonds) {
      if (bidx < 0 || bidx == skip_bond) continue;
      const Bond& d = mol.bonds[bidx];
      if (d.order == BOND_SINGLE) out.push_back(d.other(x));
    }
    return out;
  };
  // set side of n at x to s, and its sibling neighbors to -s (R1)
  auto set_end = [&](int x, int ref, int s, int dbond) {
    for (int n : single_nbrs(x, dbond)) {
      int want = (n == ref) ? s : -s;
      for (int bidx : mol.atoms[x].bonds) {
        if (bidx < 0) continue;
        const Bond& d = mol.bonds[bidx];
        if (d.order != BOND_SINGLE || d.other(x) != n) continue;
        int dir = (d.a == x) ? want : -want;
        if (ctx->bond_dir[bidx] == 0) ctx->bond_dir[bidx] = static_cast<int8_t>(dir);
        // conflicting assignment (odd conjugated cycle): keep first; the
        // affected bond's marks stay self-consistent for all other bonds.
      }
    }
  };

  size_t guard = stereo_bonds.size() + 2;
  for (size_t pass = 0; pass < guard; ++pass) {
    bool changed = false;
    int first_unknown = -1;
    for (int bi : stereo_bonds) {
      const Bond& db = mol.bonds[bi];
      int sa = get_side(db.end_a(), db.stereo_ref_a);
      int sb = get_side(db.end_b(), db.stereo_ref_b);
      if (sa != 0 && sb != 0) continue;
      if (sa == 0 && sb == 0) {
        if (first_unknown < 0) first_unknown = bi;
        continue;
      }
      if (sa != 0) {
        set_end(db.end_b(), db.stereo_ref_b, db.stereo * sa, bi);
      } else {
        set_end(db.end_a(), db.stereo_ref_a, db.stereo * sb, bi);
      }
      changed = true;
    }
    if (!changed) {
      if (first_unknown < 0) break;
      // Seed a fresh stereo system: lowest-rank end, lowest-rank single
      // neighbor goes '/' (side +1).
      const Bond& db = mol.bonds[first_unknown];
      int x = ranks[db.end_a()] <= ranks[db.end_b()] ? db.end_a() : db.end_b();
      int ref = (x == db.end_a()) ? db.stereo_ref_a : db.stereo_ref_b;
      auto nbrs = single_nbrs(x, first_unknown);
      int lowest = nbrs[0];
      for (int n : nbrs) {
        if (ranks[n] < ranks[lowest]) lowest = n;
      }
      int s = (lowest == ref) ? 1 : -1;  // lowest-rank neighbor = +1
      set_end(x, ref, s, first_unknown);
    }
  }
}

// Direction char for emitting single bond `bidx` while walking from `from`.
const char* dir_symbol(const WriteCtx& ctx, int bidx, int from) {
  int dir = ctx.bond_dir[bidx];
  if (dir == 0) return "";
  int eff = (ctx.mol->bonds[bidx].a == from) ? dir : -dir;
  return eff > 0 ? "/" : "\\";
}

std::string atom_token(const Mol& mol, int idx,
                       const std::vector<int>& out_neighbor_order,
                       const WriteCtx* ctx);

// Heavy substituents of allene terminal t (excluding the center x) in
// EMITTED order: parent, ring closures, children — the order they appear
// around t in the output string, which is the order the parser records on
// re-read (ring-closure placeholders keep the digit's slot).
std::vector<int> axial_emitted_subs(const WriteCtx& ctx, int x, int t) {
  const Mol& mol = *ctx.mol;
  const AtomPlan& plan = ctx.plan[t];
  std::vector<int> out;
  if (plan.parent_bond >= 0) {
    const int v = mol.bonds[plan.parent_bond].other(t);
    if (v != x) out.push_back(v);
  }
  for (const auto& cl : plan.closures) {
    const int v = mol.bonds[cl.first].other(t);
    if (v != x) out.push_back(v);
  }
  for (const auto& ch : plan.children) {
    if (ch.second != x) out.push_back(ch.second);
  }
  for (int h = 0; h < mol.atoms[t].n_h; ++h) out.push_back(-(2 * t + 2 + h));
  return out;
}

const char* bond_symbol(const Mol& mol, const Bond& b) {
  switch (b.order) {
    case BOND_DOUBLE: return "=";
    case BOND_TRIPLE: return "#";
    case BOND_AROMATIC: return "";
    case BOND_SINGLE:
      if (mol.atoms[b.a].aromatic && mol.atoms[b.b].aromatic) return "-";
      return "";
  }
  return "";
}

// Pass 1: discover structure.
void plan_atom(WriteCtx* ctx, int atom_idx, int parent_bond) {
  const Mol& mol = *ctx->mol;
  const Atom& atom = mol.atoms[atom_idx];
  ctx->visited[atom_idx] = true;
  ctx->plan[atom_idx].parent_bond = parent_bond;

  struct Nbr {
    int bond;
    int atom;
    int rank;
  };
  std::vector<Nbr> nbrs;
  for (int bidx : atom.bonds) {
    if (bidx == parent_bond) continue;
    const Bond& b = mol.bonds[bidx];
    nbrs.push_back({bidx, b.other(atom_idx), (*ctx->ranks)[b.other(atom_idx)]});
  }
  std::sort(nbrs.begin(), nbrs.end(), [](const Nbr& x, const Nbr& y) {
    if (x.rank != y.rank) return x.rank < y.rank;
    return x.atom < y.atom;
  });

  for (const auto& nb : nbrs) {
    if (ctx->visited[nb.atom]) {
      auto key = std::make_pair(std::min(atom_idx, nb.atom), std::max(atom_idx, nb.atom));
      if (ctx->ring_digit.count(key)) continue;  // already recorded from other side
      int digit = ctx->next_digit++;
      ctx->ring_digit[key] = digit;
      // Record at both endpoints; emission order = assignment order.
      ctx->plan[nb.atom].closures.push_back({nb.bond, digit});
      ctx->plan[atom_idx].closures.push_back({nb.bond, digit});
    } else {
      ctx->plan[atom_idx].children.push_back({nb.bond, nb.atom});
      plan_atom(ctx, nb.atom, nb.bond);
    }
  }
}

// Pass 2: emit.
void emit_atom(const WriteCtx& ctx, int atom_idx, std::string* out) {
  const Mol& mol = *ctx.mol;
  const AtomPlan& plan = ctx.plan[atom_idx];

  std::vector<int> emit_order;
  if (plan.parent_bond >= 0) emit_order.push_back(mol.bonds[plan.parent_bond].other(atom_idx));
  for (const auto& cl : plan.closures) emit_order.push_back(mol.bonds[cl.first].other(atom_idx));
  for (const auto& ch : plan.children) emit_order.push_back(ch.second);

  *out += atom_token(mol, atom_idx, emit_order, &ctx);

  for (const auto& cl : plan.closures) {
    // Matching bond symbols on both closure sides are legal SMILES.
    const Bond& b = mol.bonds[cl.first];
    *out += bond_symbol(mol, b);
    *out += dir_symbol(ctx, cl.first, atom_idx);
    if (cl.second >= 10) {
      *out += "%";
      *out += std::to_string(cl.second);
    } else {
      *out += std::to_string(cl.second);
    }
  }

  for (size_t c = 0; c < plan.children.size(); ++c) {
    const Bond& b = mol.bonds[plan.children[c].first];
    bool last = (c + 1 == plan.children.size());
    if (!last) *out += "(";
    *out += bond_symbol(mol, b);
    *out += dir_symbol(ctx, plan.children[c].first, atom_idx);
    emit_atom(ctx, plan.children[c].second, out);
    if (!last) *out += ")";
  }
}

std::string write_fragment(const Mol& mol, const std::vector<int>& ranks, int root) {
  WriteCtx ctx;
  ctx.mol = &mol;
  ctx.ranks = &ranks;
  ctx.visited.assign(mol.atoms.size(), false);
  ctx.plan.assign(mol.atoms.size(), AtomPlan());
  plan_atom(&ctx, root, -1);
  assign_directions(&ctx);
  std::string out;
  emit_atom(ctx, root, &out);
  return out;
}

std::string atom_token(const Mol& mol, int idx, const std::vector<int>& emit_order,
                       const WriteCtx* ctx) {
  const Atom& atom = mol.atoms[idx];
  std::string sym = number_to_symbol(atom.z);
  if (atom.z == 0) sym = "*";
  bool lower = atom.aromatic && is_organic_subset(atom.z) && atom.z != 9 &&
               atom.z != 17 && atom.z != 35 && atom.z != 53;
  std::string elem = sym;
  if (lower) {
    for (auto& ch : elem) ch = static_cast<char>(tolower(ch));
  }

  // Would the organic-subset shorthand reproduce n_h?
  bool needs_bracket = atom.isotope != 0 || atom.charge != 0 ||
                       atom.chirality != CHI_NONE || !is_organic_subset(atom.z);
  if (!needs_bracket) {
    // Recompute default implicit H for the shorthand form.
    int default_h;
    if (atom.aromatic) {
      int degree = static_cast<int>(atom.bonds.size());
      if (atom.z == 6 || atom.z == 5) default_h = degree <= 2 ? 1 : 0;
      else default_h = 0;
    } else {
      int bond_sum = 0;
      for (int bidx : atom.bonds) bond_sum += bond_order_int(mol.bonds[bidx].order);
      default_h = 0;
      bool fits = false;
      for (int v : organic_valences(atom.z)) {
        if (bond_sum <= v) {
          default_h = v - bond_sum;
          fits = true;
          break;
        }
      }
      // Hypervalent bracket atom (e.g. [I](C)C, [Cl](C)C): no shorthand
      // valence fits, and the bare form would be REJECTED on re-parse
      // (P[I]N -> "NIP" was a string the engine itself could not read).
      // Brackets are permissive on parse, so keep the bracket on write.
      if (!fits) needs_bracket = true;
    }
    if (default_h != atom.n_h) needs_bracket = true;
  }

  if (!needs_bracket) return elem;

  std::string token = "[";
  if (atom.isotope) token += std::to_string(atom.isotope);
  token += elem;
  if (atom.chirality != CHI_NONE) {
    Chirality chi = atom.chirality;
    int ta = -1, tb = -1;
    if (atom.bonds.size() == 2 && ctx != nullptr &&
        axial_termini(mol, idx, &ta, &tb)) {
      // Axial (allene) mark: parity from the normalized sorted reference
      // (perceive_axial_stereo) to the emitted substituent order of the two
      // termini, first-emitted terminal's substituents first — exactly what
      // the parser records on re-read.
      std::vector<int> emitted;
      for (int t : emit_order) {
        for (int v : axial_emitted_subs(*ctx, idx, t)) emitted.push_back(v);
      }
      std::vector<int> ref = emitted;
      std::sort(ref.begin(), ref.end());
      if (permutation_parity(ref, emitted)) {
        chi = (chi == CHI_CW) ? CHI_CCW : CHI_CW;
      }
    } else {
      // Tetrahedral: adjust parity, written order vs emitted order.
      std::vector<int> written_order;
      for (int bidx : atom.bonds) written_order.push_back(mol.bonds[bidx].other(idx));
      if (written_order.size() == emit_order.size() && written_order.size() >= 3) {
        int parity = permutation_parity(written_order, emit_order);
        if (parity) chi = (chi == CHI_CW) ? CHI_CCW : CHI_CW;
      }
    }
    token += (chi == CHI_CW) ? "@@" : "@";
  }
  if (atom.n_h == 1) token += "H";
  else if (atom.n_h > 1) token += "H" + std::to_string(atom.n_h);
  if (atom.charge > 0) token += atom.charge == 1 ? "+" : "+" + std::to_string(atom.charge);
  if (atom.charge < 0) token += atom.charge == -1 ? "-" : "-" + std::to_string(-atom.charge);
  token += "]";
  return token;
}

}  // namespace writer

namespace {

// Connected components.
std::vector<std::vector<int>> components(const Mol& mol) {
  int n = static_cast<int>(mol.atoms.size());
  std::vector<int> comp(n, -1);
  std::vector<std::vector<int>> out;
  for (int i = 0; i < n; ++i) {
    if (comp[i] >= 0) continue;
    std::vector<int> stack{i}, members;
    comp[i] = static_cast<int>(out.size());
    while (!stack.empty()) {
      int u = stack.back();
      stack.pop_back();
      members.push_back(u);
      for (int bidx : mol.atoms[u].bonds) {
        int v = mol.bonds[bidx].other(u);
        if (comp[v] < 0) {
          comp[v] = comp[i];
          stack.push_back(v);
        }
      }
    }
    out.push_back(members);
  }
  return out;
}

std::string canonical_fragment(const Mol& mol, const std::vector<int>& members);

// Generate the canonical SMILES for one fragment given fully-resolved ranks:
// root = atom with minimum rank among members.
std::string fragment_with_ranks(const Mol& mol, const std::vector<int>& members,
                                const std::vector<int>& ranks) {
  // Prefer a terminal atom as root (yields linear chains like "CCO" instead
  // of "C(C)O"); still input-order independent since the choice is by
  // (degree > 1, canonical rank).
  auto key = [&](int m) {
    int terminal = mol.atoms[m].bonds.size() > 1 ? 1 : 0;
    return std::make_pair(terminal, ranks[m]);
  };
  int root = members[0];
  for (int m : members) {
    if (key(m) < key(root)) root = m;
  }
  return writer::write_fragment(mol, ranks, root);
}

// Branch-and-min canonicalisation: refine; if a tie class remains, split on
// each member of the first (lowest-rank) tied class and take the lexicographic
// minimum of the resulting strings. Recursion bounded by `budget`.
std::string canonicalize_recursive(const Mol& mol, const std::vector<int>& members,
                                   std::vector<int64_t> keys, int* budget) {
  std::vector<int> ranks = refine_ranks(mol, keys);

  // Find the first tied rank class within this fragment.
  std::map<int, std::vector<int>> by_rank;
  for (int m : members) by_rank[ranks[m]].push_back(m);
  const std::vector<int>* tied = nullptr;
  for (auto& kv : by_rank) {
    if (kv.second.size() > 1) {
      tied = &kv.second;
      break;
    }
  }
  if (tied == nullptr || *budget <= 0) {
    return fragment_with_ranks(mol, members, ranks);
  }
  // Try individualizing each tied atom; take minimum string.
  std::string best;
  int tries = 0;
  for (int cand : *tied) {
    if (tries++ >= 8) break;
    --*budget;
    std::vector<int64_t> new_keys(mol.atoms.size());
    for (size_t i = 0; i < mol.atoms.size(); ++i) new_keys[i] = ranks[i] * 2 + 1;
    new_keys[cand] = ranks[cand] * 2;  // single this atom out
    std::string s = canonicalize_recursive(mol, members, new_keys, budget);
    if (best.empty() || s < best) best = s;
  }
  return best;
}

std::string canonical_fragment(const Mol& mol, const std::vector<int>& members) {
  int budget = 64;
  return canonicalize_recursive(mol, members, initial_keys(mol), &budget);
}

std::string mol_to_canonical(const Mol& mol);
void drop_uninformative_stereo(Mol* mol);

bool parse_and_sanitize(const char* smiles, Mol* mol) {
  if (smiles == nullptr) return false;
  std::string s(smiles);
  // strip whitespace
  std::string stripped;
  for (char c : s) {
    if (!isspace(static_cast<unsigned char>(c))) stripped += c;
  }
  if (stripped.empty()) return false;
  Parser parser(stripped);
  if (!parser.parse(mol)) return false;
  if (!sanitize(mol)) return false;
  drop_uninformative_stereo(mol);
  return true;
}

std::string mol_to_canonical(const Mol& mol) {
  auto comps = components(mol);
  std::vector<std::string> frags;
  for (const auto& members : comps) {
    frags.push_back(canonical_fragment(mol, members));
  }
  std::sort(frags.begin(), frags.end());
  std::string out;
  for (size_t i = 0; i < frags.size(); ++i) {
    if (i) out += ".";
    out += frags[i];
  }
  return out;
}

// Drop stereo annotations that carry no information (RDKit
// AssignStereochemistry(cleanIt=True) parity; reference metrics parse all
// predictions through RDKit, evaluation/utils.py). A tetrahedral mark or a
// double-bond descriptor is spurious iff INVERTING it leaves the canonical
// string unchanged: the two "configurations" are the same molecule, so the
// mark only bifurcates that molecule's canonical form (e.g. O[C@H]1CCCCC1
// vs OC1CCCCC1 must collapse, or a model emitting a redundant @ is scored
// wrong). Inversion testing — unlike the neighbor-symmetry-class rule —
// keeps dependent ring stereo: flipping one mark of
// cis-1,4-dimethylcyclohexane yields the trans diastereomer (a different
// string), so genuine marks survive. Runs to a fixpoint since a removal
// can render another mark spurious.
// Atom count of the smallest ring containing bond `bi` (0 if acyclic):
// BFS shortest path between the endpoints avoiding the bond itself.
int min_ring_size_through_bond(const Mol& mol, int bi) {
  const Bond& bond = mol.bonds[bi];
  std::vector<int> dist(mol.atoms.size(), -1);
  std::vector<int> queue;
  queue.push_back(bond.a);
  dist[bond.a] = 0;
  for (size_t qi = 0; qi < queue.size(); ++qi) {
    const int u = queue[qi];
    if (u == bond.b) return dist[u] + 1;
    for (int nb : mol.atoms[u].bonds) {
      if (nb == bi || nb < 0) continue;
      const int v = mol.bonds[nb].other(u);
      if (dist[v] != -1) continue;
      dist[v] = dist[u] + 1;
      queue.push_back(v);
    }
  }
  return 0;
}

void drop_uninformative_stereo(Mol* mol) {
  bool any = false;
  for (const auto& a : mol->atoms) any |= (a.chirality != CHI_NONE);
  for (const auto& b : mol->bonds) any |= (b.stereo != 0);
  if (!any) return;

  // RDKit parity: a double bond whose SMALLEST containing ring has fewer
  // than 8 atoms is never stereogenic (minBondRingSize < 8 in
  // AssignStereochemistry(cleanIt=True) — cis is the only realizable
  // geometry), so a written mark is redundant and must not bifurcate the
  // molecule's canonical form (C1/C=C\CCC1 == C1=CCCCC1). The inversion
  // test below cannot catch this class: flipping the mark yields a
  // *different* string (the impossible trans form), so the rule must be
  // explicit. Cyclooctene and larger keep genuine E/Z (ez_in_ring golden).
  for (auto& b : mol->bonds) {
    if (b.stereo == 0) continue;
    const int bi = static_cast<int>(&b - mol->bonds.data());
    const int sz = min_ring_size_through_bond(*mol, bi);
    if (sz > 0 && sz < 8) {
      b.stereo = 0;
      b.stereo_ref_a = b.stereo_ref_b = -1;
      b.stereo_end_a = b.stereo_end_b = -1;
    }
  }

  // Cheap pre-filter: a mark is only SUSPECT when two of its
  // distinguishing substituents share a stereo-blind WL symmetry class
  // (same-orbit atoms always share a rank, so all-distinct ranks prove all
  // substituents constitutionally inequivalent -> the mark is genuine and
  // needs no inversion test). Under-refined WL can only ADD suspects
  // (extra tests), never miss one. This keeps the common case — real
  // stereocenters in predictions scored at decode rate — at one extra
  // rank refinement instead of k+1 extra canonicalizations (measured
  // 232 us -> ~80 us per marked string).
  // Marks the writer cannot represent faithfully are cleared outright:
  // parity normalization permutes WRITTEN heavy-neighbor order against
  // emitted order, which needs >= 3 heavy neighbors — below that the mark
  // is emitted verbatim, so the same molecule written in two neighbor
  // orders canonicalizes to two strings (F[C@H]Cl vs Cl[C@@H]F), and the
  // inversion test always sees a changed string and keeps it. Clearing
  // restores one-molecule-one-string; it matches RDKit for carbon (a
  // 2-coordinate marked C is never a stereocenter) and deviates only on
  // pyramidal X-H stereo ([P@H](CC)C), which was never canonicalized
  // consistently here anyway. Two implicit hydrogens are likewise never
  // stereogenic.
  std::vector<char> axial(mol->atoms.size(), 0);
  for (size_t i = 0; i < mol->atoms.size(); ++i) {
    Atom& a = mol->atoms[i];
    if (a.chirality == CHI_NONE) continue;
    int ta = -1, tb = -1;
    if (a.bonds.size() == 2 &&
        axial_termini(*mol, static_cast<int>(i), &ta, &tb)) {
      // A =CH2 terminal carries two identical hydrogens: never stereogenic.
      // Cleared here because the inversion test below cannot absorb an H-H
      // swap (branch-and-min only permutes heavy emission order).
      if (mol->atoms[ta].n_h >= 2 || mol->atoms[tb].n_h >= 2) {
        a.chirality = CHI_NONE;
        continue;
      }
      axial[i] = 1;  // supported allene center: kept, suspect-tested below
      continue;
    }
    if (a.n_h >= 2 || a.bonds.size() < 3) {
      a.chirality = CHI_NONE;
      continue;
    }
    // RDKit parity (isAtomPotentialTetrahedralCenter): pyramidal trivalent
    // N inverts freely and is never a stereocenter unless locked in a
    // 3-membered ring (aziridine); [N@](C)(CC)CCC == N(C)(CC)CCC. P/As and
    // 3-coordinate S/Se (sulfoxide, sulfonium) invert slowly and keep
    // their marks; 4-coordinate N (quaternary, N-oxide) stays stereogenic.
    if (a.z == 7 && a.bonds.size() == 3 && a.n_h == 0) {
      bool in_3ring = false;
      for (size_t x = 0; x < a.bonds.size() && !in_3ring; ++x) {
        for (size_t y = x + 1; y < a.bonds.size() && !in_3ring; ++y) {
          if (a.bonds[x] < 0 || a.bonds[y] < 0) continue;
          const int u = mol->bonds[a.bonds[x]].other(static_cast<int>(i));
          const int v = mol->bonds[a.bonds[y]].other(static_cast<int>(i));
          for (int bidx : mol->atoms[u].bonds) {
            if (bidx >= 0 && mol->bonds[bidx].other(u) == v) {
              in_3ring = true;
              break;
            }
          }
        }
      }
      if (!in_3ring) a.chirality = CHI_NONE;
    }
  }

  const std::vector<int> ranks = refine_ranks(*mol, initial_keys(*mol));
  std::vector<int> suspect_atoms;
  std::vector<int> suspect_bonds;
  for (size_t i = 0; i < mol->atoms.size(); ++i) {
    const Atom& a = mol->atoms[i];
    if (a.chirality == CHI_NONE) continue;
    bool tied = false;
    if (axial[i]) {
      // Allene mark is suspect when EITHER terminal's two substituent
      // slots tie (two implicit H, or two heavy neighbors in one WL class).
      int ta = -1, tb = -1;
      axial_termini(*mol, static_cast<int>(i), &ta, &tb);
      for (int t : {ta, tb}) {
        const Atom& term = mol->atoms[t];
        tied |= (term.n_h >= 2);
        std::vector<int> subs;
        for (int bidx : term.bonds) {
          const int v = mol->bonds[bidx].other(t);
          if (v != static_cast<int>(i)) subs.push_back(ranks[v]);
        }
        tied |= (subs.size() == 2 && subs[0] == subs[1]);
      }
    } else {
      tied = a.n_h >= 2;  // two identical implicit-H substituents
      std::vector<int> nb;
      for (int bidx : a.bonds) {
        nb.push_back(ranks[mol->bonds[bidx].other(static_cast<int>(i))]);
      }
      std::sort(nb.begin(), nb.end());
      for (size_t j = 1; j < nb.size() && !tied; ++j) {
        tied |= (nb[j] == nb[j - 1]);
      }
    }
    if (tied) suspect_atoms.push_back(static_cast<int>(i));
  }
  for (size_t i = 0; i < mol->bonds.size(); ++i) {
    const Bond& db = mol->bonds[i];
    if (db.stereo == 0) continue;
    bool tied = false;
    for (int end : {db.end_a(), db.end_b()}) {
      std::vector<int> subs;  // single-bonded substituents of this unit end
      for (int bidx : mol->atoms[end].bonds) {  // (excludes the double bond
        const Bond& nb = mol->bonds[bidx];      //  into the chain/partner)
        if (nb.order != BOND_SINGLE) continue;
        subs.push_back(ranks[nb.other(end)]);
      }
      tied |= (subs.size() == 2 && subs[0] == subs[1]);
    }
    if (tied) suspect_bonds.push_back(static_cast<int>(i));
  }
  if (suspect_atoms.empty() && suspect_bonds.empty()) return;

  // Inversion test, to a fixpoint (a removal can flip another suspect's
  // outcome): a suspect whose inversion leaves the canonical string
  // unchanged carries no information and is dropped.
  bool changed = true;
  int guard = 0;
  std::string base = mol_to_canonical(*mol);
  while (changed && guard++ < 8) {
    changed = false;
    for (int ai : suspect_atoms) {
      Atom& a = mol->atoms[ai];
      if (a.chirality == CHI_NONE) continue;
      const Chirality orig = a.chirality;
      a.chirality = (orig == CHI_CW) ? CHI_CCW : CHI_CW;
      const bool same = (mol_to_canonical(*mol) == base);
      a.chirality = same ? CHI_NONE : orig;
      if (same) {
        changed = true;
        base = mol_to_canonical(*mol);
      }
    }
    for (int bi : suspect_bonds) {
      Bond& b = mol->bonds[bi];
      if (b.stereo == 0) continue;
      const int8_t orig = b.stereo;
      b.stereo = static_cast<int8_t>(-orig);
      const bool same = (mol_to_canonical(*mol) == base);
      b.stereo = same ? 0 : orig;
      if (same) {
        changed = true;
        base = mol_to_canonical(*mol);
      }
    }
  }
}

std::string mol_formula(const Mol& mol) {
  std::map<std::string, int> counts;
  int h = 0, charge = 0;
  for (const auto& atom : mol.atoms) {
    if (atom.z == 1) {
      h += 1 + atom.n_h;
    } else if (atom.z > 0) {
      counts[number_to_symbol(atom.z)] += 1;
      h += atom.n_h;
    }
    charge += atom.charge;
  }
  std::string out;
  auto append = [&out](const std::string& sym, int n) {
    out += sym;
    if (n > 1) out += std::to_string(n);
  };
  // Hill order.
  if (counts.count("C")) {
    append("C", counts["C"]);
    counts.erase("C");
    if (h > 0) append("H", h);
  } else if (h > 0) {
    counts["H"] += h;
  }
  for (const auto& kv : counts) append(kv.first, kv.second);
  if (charge > 0) out += charge == 1 ? "+" : "+" + std::to_string(charge);
  if (charge < 0) out += charge == -1 ? "-" : "-" + std::to_string(-charge);
  return out;
}

std::string random_fragment(const Mol& mol, const std::vector<int>& members,
                            std::mt19937* rng) {
  // Random ranks induce a random DFS order.
  std::vector<int> ranks(mol.atoms.size());
  for (size_t i = 0; i < ranks.size(); ++i) ranks[i] = static_cast<int>(i);
  std::shuffle(ranks.begin(), ranks.end(), *rng);
  int root = members[(*rng)() % members.size()];
  return writer::write_fragment(mol, ranks, root);
}

int copy_out(const std::string& s, char* out, int out_len) {
  if (static_cast<int>(s.size()) + 1 > out_len) return -2;
  std::memcpy(out, s.c_str(), s.size() + 1);
  return 0;
}

}  // namespace

// ---------------------------------------------------------------------------
// 3D conformer embedding (distance geometry + spring refinement)
//
// Replaces RDKit's EmbedMolecule for the dataset-paper tooling
// (reference paper_replication/scripts_ir_nmr_multimodal_comp_spectra_dataset/
// scripts/make_xyz_file_from_smiles.py:22-29). Produces chemically plausible
// starting geometries — ideal bond lengths from covalent radii,
// hybridization-derived 1-3 distances, rigid aromatic-ring chord sets, and a
// soft nonbonded lower bound — refined by Adam on the squared distance
// errors from a random start (best of a few restarts). CPMD/DFT workflows
// geometry-optimize their inputs, so this fidelity level is fit for purpose;
// these are NOT equilibrium structures.
// ---------------------------------------------------------------------------

namespace embed3d {

double covalent_radius(int z) {
  switch (z) {
    case 1: return 0.31;
    case 5: return 0.84;
    case 6: return 0.76;
    case 7: return 0.71;
    case 8: return 0.66;
    case 9: return 0.57;
    case 14: return 1.11;
    case 15: return 1.07;
    case 16: return 1.05;
    case 17: return 1.02;
    case 33: return 1.19;
    case 34: return 1.20;
    case 35: return 1.20;
    case 53: return 1.39;
    default: return 0.9;
  }
}

struct Spring { int a, b; double d0, w; };
struct LowerBound { int a, b; double dmin, w; };

struct Site { int z; };

void build_system(const Mol& mol, std::vector<Site>* sites,
                  std::vector<Spring>* springs,
                  std::vector<LowerBound>* lowers) {
  int n_heavy = static_cast<int>(mol.atoms.size());
  for (const auto& a : mol.atoms) sites->push_back({a.z});

  // adjacency (heavy graph) + bond springs
  std::vector<std::vector<std::pair<int, double>>> nbrs(n_heavy);
  for (const auto& b : mol.bonds) {
    double d0 = covalent_radius(mol.atoms[b.a].z) + covalent_radius(mol.atoms[b.b].z);
    if (b.order == BOND_DOUBLE) d0 *= 0.89;
    else if (b.order == BOND_TRIPLE) d0 *= 0.80;
    else if (b.order == BOND_AROMATIC) d0 *= 0.93;
    springs->push_back({b.a, b.b, d0, 10.0});
    nbrs[b.a].push_back({b.b, d0});
    nbrs[b.b].push_back({b.a, d0});
  }

  // explicit hydrogens
  for (int a = 0; a < n_heavy; ++a) {
    double dH = covalent_radius(mol.atoms[a].z) + covalent_radius(1);
    for (int h = 0; h < mol.atoms[a].n_h; ++h) {
      int idx = static_cast<int>(sites->size());
      sites->push_back({1});
      springs->push_back({a, idx, dH, 10.0});
      nbrs[a].push_back({idx, dH});
      if (idx >= static_cast<int>(nbrs.size())) nbrs.resize(idx + 1);
      nbrs[idx].push_back({a, dH});
    }
  }
  int n = static_cast<int>(sites->size());

  // hybridization-derived 1-3 distances (law of cosines)
  auto angle_for = [&](int center) {
    if (center >= n_heavy) return 109.47;
    const Atom& atom = mol.atoms[center];
    int n_double = 0, n_triple = 0;
    for (int bi : atom.bonds) {
      if (mol.bonds[bi].order == BOND_DOUBLE) ++n_double;
      if (mol.bonds[bi].order == BOND_TRIPLE) ++n_triple;
    }
    if (n_triple > 0 || n_double >= 2) return 180.0;
    if (n_double == 1 || atom.aromatic) return 120.0;
    return 109.47;
  };
  std::set<std::pair<int, int>> constrained;
  for (const auto& s : *springs) {
    constrained.insert({std::min(s.a, s.b), std::max(s.a, s.b)});
  }
  for (int c = 0; c < n; ++c) {
    double theta = angle_for(c) * 3.14159265358979 / 180.0;
    const auto& local = nbrs[c];
    for (size_t i = 0; i < local.size(); ++i) {
      for (size_t j = i + 1; j < local.size(); ++j) {
        double di = local[i].second, dj = local[j].second;
        double d = std::sqrt(di * di + dj * dj - 2 * di * dj * std::cos(theta));
        auto key = std::make_pair(std::min(local[i].first, local[j].first),
                                  std::max(local[i].first, local[j].first));
        if (constrained.count(key)) continue;
        constrained.insert(key);
        springs->push_back({key.first, key.second, d, 3.0});
      }
    }
  }

  // rigid aromatic rings: full chord-distance sets (enforces planarity)
  for (const auto& ring : find_rings(mol, 7)) {
    bool aromatic = true;
    for (int a : ring) aromatic = aromatic && mol.atoms[a].aromatic;
    if (!aromatic || ring.size() < 5) continue;
    int m = static_cast<int>(ring.size());
    double edge = 2 * covalent_radius(6) * 0.93;
    double radius = edge / (2 * std::sin(3.14159265358979 / m));
    for (int i = 0; i < m; ++i) {
      for (int j = i + 1; j < m; ++j) {
        int k = std::min(j - i, m - (j - i));
        if (k <= 1) continue;
        double chord = 2 * radius * std::sin(k * 3.14159265358979 / m);
        auto key = std::make_pair(std::min(ring[i], ring[j]),
                                  std::max(ring[i], ring[j]));
        if (constrained.count(key)) continue;
        constrained.insert(key);
        // strong weight: the full chord set pins the ring planar
        springs->push_back({key.first, key.second, chord, 8.0});
      }
    }
  }

  // nonbonded lower bounds for every unconstrained pair
  for (int i = 0; i < n; ++i) {
    for (int j = i + 1; j < n; ++j) {
      if (constrained.count({i, j})) continue;
      bool has_h = (*sites)[i].z == 1 || (*sites)[j].z == 1;
      lowers->push_back({i, j, has_h ? 1.6 : 2.2, 1.0});
    }
  }
}

double refine(std::vector<double>* coords, const std::vector<Spring>& springs,
              const std::vector<LowerBound>& lowers, int iters) {
  int n = static_cast<int>(coords->size() / 3);
  std::vector<double> grad(n * 3), m1(n * 3, 0.0), m2(n * 3, 0.0);
  double loss = 0.0;
  for (int it = 0; it < iters; ++it) {
    // cosine-decayed step: coarse placement early, tight convergence late
    double lr = 0.001 + 0.049 * 0.5 *
                (1.0 + std::cos(3.14159265358979 * it / iters));
    std::fill(grad.begin(), grad.end(), 0.0);
    loss = 0.0;
    auto accumulate = [&](int a, int b, double d0, double w, bool lower_only) {
      double dx = (*coords)[3 * a] - (*coords)[3 * b];
      double dy = (*coords)[3 * a + 1] - (*coords)[3 * b + 1];
      double dz = (*coords)[3 * a + 2] - (*coords)[3 * b + 2];
      double d = std::sqrt(dx * dx + dy * dy + dz * dz) + 1e-9;
      if (lower_only && d >= d0) return;
      double diff = d - d0;
      loss += w * diff * diff;
      double g = 2.0 * w * diff / d;
      grad[3 * a] += g * dx;     grad[3 * b] -= g * dx;
      grad[3 * a + 1] += g * dy; grad[3 * b + 1] -= g * dy;
      grad[3 * a + 2] += g * dz; grad[3 * b + 2] -= g * dz;
    };
    for (const auto& s : springs) accumulate(s.a, s.b, s.d0, s.w, false);
    for (const auto& l : lowers) accumulate(l.a, l.b, l.dmin, l.w, true);
    double b1 = 0.9, b2 = 0.999;
    double corr1 = 1.0 - std::pow(b1, it + 1);
    double corr2 = 1.0 - std::pow(b2, it + 1);
    for (size_t i = 0; i < grad.size(); ++i) {
      m1[i] = b1 * m1[i] + (1 - b1) * grad[i];
      m2[i] = b2 * m2[i] + (1 - b2) * grad[i] * grad[i];
      (*coords)[i] -= lr * (m1[i] / corr1) / (std::sqrt(m2[i] / corr2) + 1e-8);
    }
  }
  return loss;
}

std::string embed_xyz(const Mol& mol, unsigned seed) {
  std::vector<Site> sites;
  std::vector<Spring> springs;
  std::vector<LowerBound> lowers;
  build_system(mol, &sites, &springs, &lowers);
  int n = static_cast<int>(sites.size());

  std::mt19937 rng(seed * 2654435761u + 12345u);
  std::normal_distribution<double> normal(0.0, 1.0);
  double scale = 1.0 + 0.4 * std::cbrt(static_cast<double>(n));
  std::vector<double> best;
  double best_loss = 1e30;
  for (int attempt = 0; attempt < 3; ++attempt) {
    std::vector<double> coords(n * 3);
    for (auto& c : coords) c = normal(rng) * scale;
    double loss = refine(&coords, springs, lowers, 4000);
    if (loss < best_loss) {
      best_loss = loss;
      best = coords;
    }
  }

  char line[128];
  std::string out = std::to_string(n) + "\n";
  out += "generated by multimodalanalytical_tpu chem engine (distance "
         "geometry; pre-optimization geometry)\n";
  for (int i = 0; i < n; ++i) {
    snprintf(line, sizeof(line), "%s %.4f %.4f %.4f\n",
             number_to_symbol(sites[i].z), best[3 * i], best[3 * i + 1],
             best[3 * i + 2]);
    out += line;
  }
  return out;
}

}  // namespace embed3d

extern "C" {

// Returns 0 on success, -1 on parse/sanitize failure, -2 buffer too small.
int afm_canonicalize(const char* smiles, char* out, int out_len) {
  Mol mol;
  if (!parse_and_sanitize(smiles, &mol)) return -1;
  return copy_out(mol_to_canonical(mol), out, out_len);
}

int afm_mol_formula(const char* smiles, char* out, int out_len) {
  Mol mol;
  if (!parse_and_sanitize(smiles, &mol)) return -1;
  return copy_out(mol_formula(mol), out, out_len);
}

int afm_parse_ok(const char* smiles) {
  Mol mol;
  return parse_and_sanitize(smiles, &mol) ? 1 : 0;
}

int afm_random_smiles(const char* smiles, unsigned seed, char* out, int out_len) {
  Mol mol;
  if (!parse_and_sanitize(smiles, &mol)) return -1;
  std::mt19937 rng(seed);
  auto comps = components(mol);
  std::string result;
  for (size_t i = 0; i < comps.size(); ++i) {
    if (i) result += ".";
    result += random_fragment(mol, comps[i], &rng);
  }
  return copy_out(result, out, out_len);
}

// Local atom environment: canonical SMILES of the subgraph within
// `radius` bonds of the first atom with atomic number `center_z`
// (reference: FindAtomEnvironmentOfRadiusN + PathToSubmol usage in
// paper_replication/phosphor/scripts/process_hack_data.py:18-36).
// Returns 0 ok, -1 parse failure, -3 no such atom / empty environment.
int afm_atom_environment(const char* smiles, int center_z, int radius,
                         char* out, int out_len) {
  Mol mol;
  if (!parse_and_sanitize(smiles, &mol)) return -1;
  int center = -1;
  for (size_t i = 0; i < mol.atoms.size(); ++i) {
    if (mol.atoms[i].z == center_z) {
      center = static_cast<int>(i);
      break;
    }
  }
  if (center < 0) return -3;

  // BFS over bonds up to `radius` hops.
  std::vector<int> depth(mol.atoms.size(), -1);
  std::set<int> keep_bonds;
  depth[center] = 0;
  std::vector<int> queue{center};
  for (size_t qi = 0; qi < queue.size(); ++qi) {
    int u = queue[qi];
    if (depth[u] >= radius) continue;
    for (int bidx : mol.atoms[u].bonds) {
      keep_bonds.insert(bidx);
      int v = mol.bonds[bidx].other(u);
      if (depth[v] < 0) {
        depth[v] = depth[u] + 1;
        queue.push_back(v);
      }
    }
  }
  if (keep_bonds.empty()) return -3;

  // Build the sub-molecule: atoms incident to kept bonds; implicit H counts
  // recomputed from the remaining bonds (submol valences are open).
  std::map<int, int> remap;
  Mol sub;
  for (int bidx : keep_bonds) {
    for (int endpoint : {mol.bonds[bidx].a, mol.bonds[bidx].b}) {
      if (!remap.count(endpoint)) {
        Atom atom = mol.atoms[endpoint];
        atom.bonds.clear();
        atom.explicit_h = -1;
        atom.chirality = CHI_NONE;
        remap[endpoint] = static_cast<int>(sub.atoms.size());
        sub.atoms.push_back(atom);
      }
    }
  }
  for (int bidx : keep_bonds) {
    const Bond& b = mol.bonds[bidx];
    sub.add_bond(remap[b.a], remap[b.b], b.order);
  }
  // Recompute H; aromatic fragments may not kekulize — fall back to
  // treating unresolved aromatic atoms leniently by skipping the check.
  for (auto& atom : sub.atoms) {
    if (atom.aromatic) continue;
    int bond_sum = 0;
    for (int bidx : atom.bonds) bond_sum += bond_order_int(sub.bonds[bidx].order);
    atom.n_h = 0;
    for (int v : organic_valences(atom.z)) {
      if (bond_sum <= v) {
        atom.n_h = v - bond_sum;
        break;
      }
    }
  }
  for (auto& atom : sub.atoms) {
    if (!atom.aromatic) continue;
    int degree = static_cast<int>(atom.bonds.size());
    atom.n_h = (atom.z == 6 && degree <= 2) ? 1 : 0;
  }
  return copy_out(mol_to_canonical(sub), out, out_len);
}

// Atom counts for guided decoding. `zs` is an array of atomic numbers of
// length n; counts[i] receives the count of that element (H includes
// implicit hydrogens).
int afm_atom_counts(const char* smiles, const int* zs, int n, int* counts) {
  Mol mol;
  if (!parse_and_sanitize(smiles, &mol)) return -1;
  std::map<int, int> by_z;
  int h = 0;
  for (const auto& atom : mol.atoms) {
    if (atom.z == 1) h += 1 + atom.n_h;
    else {
      by_z[atom.z] += 1;
      h += atom.n_h;
    }
  }
  by_z[1] = h;
  for (int i = 0; i < n; ++i) {
    auto it = by_z.find(zs[i]);
    counts[i] = it == by_z.end() ? 0 : it->second;
  }
  return 0;
}


// XYZ-format 3D conformer (distance-geometry embedding; see namespace
// embed3d). Returns 0 on success, -1 on parse failure, -2 small buffer.
int afm_embed3d(const char* smiles, unsigned seed, char* out, int out_len) {
  Mol mol;
  if (!parse_and_sanitize(smiles, &mol)) return -1;
  return copy_out(embed3d::embed_xyz(mol, seed), out, out_len);
}

}  // extern "C"
