"""Sources & sinks: testdata loaders, fixture generators, snapshot TableIO."""
