// reserved for native image ops
