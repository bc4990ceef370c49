/* commonC shim: the reference includes it alongside sonLib.h/bioioC.h but
 * uses no symbols beyond those two surfaces (verified by grep over impl/). */
#ifndef COMMONC_SHIM_H_
#define COMMONC_SHIM_H_
#include "sonLib.h"
#include "bioioC.h"
#endif
