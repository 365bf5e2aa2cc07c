#pragma once  // included by MinimizerSeeder.h but unused
