"""wikipedia_wikidata_ray.state"""
