/* Minimal util::string helpers used by the reference headers. */

#ifndef UTIL_STRINGS_STUB_HEADER
#define UTIL_STRINGS_STUB_HEADER

#include <iomanip>
#include <sstream>
#include <string>

namespace util {
namespace string {

template <typename T>
std::string get (T const& value)
{
    std::ostringstream ss;
    ss << value;
    return ss.str();
}

template <typename T>
std::string get_filled (T const& value, int width, char fill = '0')
{
    std::ostringstream ss;
    ss << std::setw(width) << std::setfill(fill) << value;
    return ss.str();
}

}  // namespace string
}  // namespace util

#endif /* UTIL_STRINGS_STUB_HEADER */
