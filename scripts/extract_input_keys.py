"""Extract each reference hydrological module's input_files_keys declaration
(class attribute literals) into JSON — shared configuration data needed for
settings pre-flight validation."""
import ast
import glob
import json
import os

OUT = "/root/repo/lisflood_tpu/config/input_keys.json"
result = {}
for path in sorted(glob.glob("/root/reference/src/lisflood/hydrological_modules/*.py")):
    tree = ast.parse(open(path).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef):
            for stmt in node.body:
                if isinstance(stmt, ast.Assign) and any(
                        getattr(t, "id", None) == "input_files_keys" for t in stmt.targets):
                    try:
                        val = ast.literal_eval(stmt.value)
                    except (ValueError, TypeError):
                        continue
                    result[node.name] = val
json.dump(result, open(OUT, "w"), indent=1, sort_keys=True)
print(len(result), "modules")
