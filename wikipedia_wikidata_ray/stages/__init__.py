"""wikipedia_wikidata_ray.stages"""
