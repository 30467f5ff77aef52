// Single-TU amalgamation: smarts.cpp matches against the molecule
// representation defined in chem.cpp's anonymous namespace.
#include "chem.cpp"   // NOLINT
#include "smarts.cpp" // NOLINT
