/* Empty stand-in: the compiled reference subset includes mve/image_io.h
 * but calls none of its functions (debug-only in the full app). */

#ifndef MVE_IMAGE_IO_STUB_HEADER
#define MVE_IMAGE_IO_STUB_HEADER

#include "mve/image.h"

#endif /* MVE_IMAGE_IO_STUB_HEADER */
