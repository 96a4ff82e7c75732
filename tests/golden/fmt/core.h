// Minimal stub of fmt/format.h for compiling reference translation units
// in the golden-vector harness (the vendored fmt submodule is empty in the
// reference snapshot; fmt::format is only reached on error paths we never
// trigger).
#pragma once
#include <string>

namespace fmt {
template <typename... Args>
inline std::string format(const char* f, Args&&...) {
    return std::string(f);
}
}  // namespace fmt
