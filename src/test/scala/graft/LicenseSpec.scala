package graft

import graft.operators.License

/** License detection: SPDX tag capture (precedence, comment closers,
  * expression charset, scan bound), header-phrase families across
  * comment styles, the none tier, and the distributed view.
  */
class LicenseSpec extends SparkSpec {

  test("SPDX tags: line and block comments, expressions, precedence over phrases") {
    assert(License.detect("// SPDX-License-Identifier: MIT\ncode();") == (("MIT", "spdx")))
    assert(License.detect("/* SPDX-License-Identifier: Apache-2.0 */ x") ==
      (("Apache-2.0", "spdx")))
    assert(License.detect("# SPDX-License-Identifier: GPL-3.0-or-later") ==
      (("GPL-3.0-or-later", "spdx")))
    assert(License.detect("<!-- SPDX-License-Identifier: CC-BY-4.0 --> doc") ==
      (("CC-BY-4.0", "spdx")))
    assert(License.detect("// spdx-license-identifier: mit") == (("mit", "spdx")))
    // expressions survive verbatim
    assert(License.detect("// SPDX-License-Identifier: (MIT OR Apache-2.0)") ==
      (("(MIT OR Apache-2.0)", "spdx")))
    // the tag WINS over a conflicting classic header below it
    val both = "// SPDX-License-Identifier: BSD-3-Clause\n" +
      "// Permission is hereby granted, free of charge, to any person"
    assert(License.detect(both) == (("BSD-3-Clause", "spdx")))
    // a junk expression is NOT trusted — falls through to the phrase tier
    assert(License.detect("// SPDX-License-Identifier: {not@legal}\n" +
      "// Permission is hereby granted, free of charge") == (("MIT", "header")))
  }

  test("header phrases: each family, across comment styles and line wraps") {
    assert(License.detect(" * Permission is hereby granted, free of\n * charge, to any person")
      == (("MIT", "header")))
    assert(License.detect("# Licensed under the Apache License, Version 2.0 (the \"License\")")
      == (("Apache-2.0", "header")))
    assert(License.detect("// Redistribution and use in source and binary forms, with or without")
      == (("BSD", "header")))
    assert(License.detect("This program is free software: GNU General Public License v3")
      == (("GPL", "header")))
    assert(License.detect("/* This Source Code Form is subject to the terms of the Mozilla Public License, v. 2.0 */")
      == (("MPL-2.0", "header")))
    assert(License.detect("This is free and unencumbered software released into the public domain.")
      == (("Unlicense", "header")))
  }

  test("none tier and the scan bound: a deep tag is out of window") {
    assert(License.detect("def f(): pass") == ((null, "none")))
    assert(License.detect(null) == ((null, "none")))
    assert(License.detect("") == ((null, "none")))
    val deep = "x\n" * 3000 + "// SPDX-License-Identifier: MIT"
    assert(License.detect(deep) == ((null, "none"))) // beyond the 4096-char window
    assert(License.detect(deep, maxScanChars = 10000) == (("MIT", "spdx")))
  }

  test("licenseRows: distributed view is map-only; mixed outcomes coexist") {
    import spark.implicits._
    val df = Seq(
      (1L, "// SPDX-License-Identifier: MIT\nx"),
      (2L, "# Licensed under the Apache License, Version 2.0"),
      (3L, "plain text")).toDF("doc_id", "text")
    val out = License.licenseRows(df, "doc_id", "text")
    graft.queries.Q.requireNoShuffle(out)
    val got = out.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1L, "MIT", "spdx"), (2L, "Apache-2.0", "header"),
      (3L, null, "none")))
  }
}
