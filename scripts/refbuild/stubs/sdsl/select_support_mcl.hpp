#pragma once  // included but unused
