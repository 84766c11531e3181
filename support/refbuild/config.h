/* Hand-written config.h for the out-of-tree reference cross-check build
 * (the reference generates this from src/config.h.in via CMake).
 * glibc has strndup; gcc >= 4.7 provides __builtin_complex (CMPLXF).
 * FAAD2 is NOT enabled: HDC packets (not PCM) are the comparison boundary. */
#pragma once

#define HAVE_STRNDUP 1
#define LIBRARY_DEBUG_LEVEL 5 /* silent, the reference CMake default */

#ifndef CMPLXF
#define CMPLXF(x, y) __builtin_complex((float)(x), (float)(y))
#endif
